"""Loss tests: golden values vs the live torch reference, plus properties."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadow_removal_istd_tpu.losses import (
    AdversarialLoss,
    began_k_update,
    l1_loss,
    make_adversarial_loss,
    softadapt_combine,
    softadapt_init,
    softadapt_update,
    visual_loss,
)

KEY = jax.random.key(0)


class TestL1:
    def test_golden(self):
        pred = jnp.array([1.0, 2.0, 3.0])
        target = jnp.array([0.0, 0.0, 0.0])
        assert float(l1_loss(pred, target)) == pytest.approx(2.0)


class TestAdversarial:
    def test_lsgan_perfect_d(self):
        # default executed path: MSE, labels 1/0
        loss = AdversarialLoss()
        c_real = jnp.ones((2, 4, 4, 1))
        c_fake = jnp.zeros((2, 4, 4, 1))
        assert float(loss.d_loss(c_real, c_fake)) == pytest.approx(0.0)
        # G wants fake -> 1: MSE(0, 1) = 1 (no 0.5 factor in the G branch)
        assert float(loss.g_loss(c_real, c_fake)) == pytest.approx(1.0)

    def test_relativistic_shift_invariance(self):
        # RpGAN depends only on the difference c_real - c_fake
        loss = AdversarialLoss(rel=True)
        r = jax.random.normal(KEY, (4, 3, 3, 1))
        f = jax.random.normal(jax.random.key(1), (4, 3, 3, 1))
        a = float(loss.d_loss(r, f))
        b = float(loss.d_loss(r + 5.0, f + 5.0))
        assert a == pytest.approx(b, rel=1e-5)

    def test_engine_wiring_reproduces_typo(self):
        # "leastsquare" flag never enables ls in reference mode (the typo)
        for flag in ["standard", "leastsquare"]:
            adv = make_adversarial_loss(flag, "normal", mode="reference")
            assert adv.ls is False  # MSE (least-squares) is what runs
        adv = make_adversarial_loss("leastsquare", "normal", mode="corrected")
        assert adv.ls is True

    @pytest.mark.parametrize("ls", [False, True])
    @pytest.mark.parametrize("rel,avg", [(False, False), (True, False),
                                         (True, True)])
    def test_matches_torch_oracle(self, ls, rel, avg):
        """Cross-framework oracle: the reference's AdversarialLoss math
        (src/loss.py:79-112, incl. the inverted ls branch and the
        fake_label=-1-when-ls quirk) expressed with torch primitives."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        real_label = torch.tensor(1.0)
        fake_label = torch.tensor(-1.0 if ls else 0.0)

        def cal(c, label):
            t = label.expand_as(c)
            return F.mse_loss(c, t) if not ls \
                else F.binary_cross_entropy_with_logits(c, t)

        def ref(c_real, c_fake, d_dir):
            if d_dir:
                if rel and avg:
                    return (cal(c_real - c_fake.mean(dim=0), real_label)
                            + cal(c_fake - c_real.mean(dim=0), fake_label)) / 2
                if rel:
                    return cal(c_real - c_fake, real_label)
                return (cal(c_real, real_label)
                        + cal(c_fake, fake_label)) / 2
            if rel and avg:
                return (cal(c_fake - c_real.mean(dim=0), real_label)
                        + cal(c_real - c_fake.mean(dim=0), fake_label)) / 2
            if rel:
                return cal(c_fake - c_real, real_label)
            return cal(c_fake, real_label)

        rng = np.random.default_rng(7)
        c_real = rng.normal(size=(4, 1, 6, 6)).astype(np.float32)
        c_fake = rng.normal(size=(4, 1, 6, 6)).astype(np.float32)
        ours = AdversarialLoss(ls=ls, rel=rel, avg=avg, mode="reference")
        for d_dir in [True, False]:
            ref_val = float(ref(torch.tensor(c_real), torch.tensor(c_fake),
                                d_dir))
            fn = ours.d_loss if d_dir else ours.g_loss
            our_val = float(fn(jnp.asarray(c_real), jnp.asarray(c_fake)))
            assert our_val == pytest.approx(ref_val, rel=1e-5), \
                f"ls={ls} rel={rel} avg={avg} D={d_dir}"


class TestVisual:
    def test_shapes_and_gradient_flow(self):
        from shadow_removal_istd_tpu.models.vgg import init_vgg_variables
        vgg_vars = init_vgg_variables(KEY, image_size=32)
        pred = jax.random.uniform(KEY, (1, 32, 32, 3)) * 2 - 1
        target = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3)) * 2 - 1
        val, grad = jax.value_and_grad(
            lambda p: visual_loss(vgg_vars, p, target))(pred)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0
        # identical inputs -> zero loss
        z = visual_loss(vgg_vars, target, target)
        assert float(z) == pytest.approx(0.0, abs=1e-8)

    def test_single_channel_broadcast(self):
        # equality against explicitly tiled 3-channel inputs with
        # pred != target — loss(m, m) == 0 cannot distinguish the
        # reference's expand() from any other channel handling
        from shadow_removal_istd_tpu.models.vgg import init_vgg_variables
        vgg_vars = init_vgg_variables(KEY, image_size=32)
        k1, k2 = jax.random.split(KEY)
        m = jax.random.uniform(k1, (1, 32, 32, 1)) * 2 - 1
        t = jax.random.uniform(k2, (1, 32, 32, 1)) * 2 - 1
        one_ch = visual_loss(vgg_vars, m, t)
        tiled = visual_loss(vgg_vars, jnp.repeat(m, 3, axis=-1),
                            jnp.repeat(t, 3, axis=-1))
        assert float(one_ch) > 0
        assert float(one_ch) == pytest.approx(float(tiled), rel=1e-6)


class TestSoftAdapt:
    def test_weights_normalized(self):
        st = softadapt_init(3, init_weights=[1.0, 5.0, 0.5])
        assert float(st.weights.sum()) == pytest.approx(1.0)
        losses = jnp.array([1.0, 2.0, 0.5])
        st2 = softadapt_update(st, losses)
        # EMA with alpha=.9 keeps weights near a simplex point
        assert float(st2.weights.sum()) == pytest.approx(1.0, abs=1e-5)
        assert np.allclose(np.asarray(st2.prev_loss), np.asarray(losses))

    def test_combine(self):
        st = softadapt_init(2)
        total = softadapt_combine(st, jnp.array([2.0, 4.0]))
        assert float(total) == pytest.approx(3.0)

    @pytest.mark.skipif(not os.path.isdir("/root/reference"),
                        reason="reference not mounted")
    def test_matches_torch_reference(self):
        import sys
        sys.path.insert(0, "/root/reference")
        torch = pytest.importorskip("torch")
        try:
            from src.loss import SoftAdapt as RefSA
        except Exception as e:
            pytest.skip(f"reference import failed: {e}")
        ref = RefSA(["a", "b", "c"], init_weights=[1.0, 2.0, 3.0])
        st = softadapt_init(3, init_weights=[1.0, 2.0, 3.0])
        losses_seq = [np.array([1.0, 2.0, 3.0], np.float32),
                      np.array([0.9, 2.2, 2.5], np.float32),
                      np.array([0.8, 1.9, 2.0], np.float32)]
        for ls in losses_seq:
            ref_total = float(ref(
                {k: torch.tensor(v) for k, v in zip("abc", ls)},
                update_weights=True))
            st = softadapt_update(st, jnp.asarray(ls))
            our_total = float(softadapt_combine(st, jnp.asarray(ls)))
            assert our_total == pytest.approx(ref_total, rel=1e-4)


class TestBegan:
    def test_k_update_clipped(self):
        k = began_k_update(jnp.asarray(0.0), 1.0, 0.1)
        # 0 + 0.001*(0.7*1 - 0.1) = 0.0006
        assert float(k) == pytest.approx(0.0006)
        k = began_k_update(jnp.asarray(0.0), 0.0, 10.0)
        assert float(k) == 0.0  # clipped at 0
        k = began_k_update(jnp.asarray(1.0), 10.0, 0.0)
        assert float(k) == 1.0  # clipped at 1
