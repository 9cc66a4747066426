"""Model zoo tests: parameter-count parity with the torch reference,
output shapes, and train/eval behaviour.

Golden parameter counts were measured from the reference implementation
(src/networks.py factories) with identical constructor arguments; shape
golds come from the same run. ``jax.eval_shape`` keeps these tests cheap
(no compilation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadow_removal_istd_tpu.models import (
    get_discriminator,
    get_generator,
)

KEY = jax.random.key(0)


def param_count(model, x_shape, **apply_kwargs):
    x = jnp.zeros(x_shape, jnp.float32)
    shapes = jax.eval_shape(lambda: model.init({"params": KEY}, x))
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))


def out_shape(model, x_shape):
    x = jnp.zeros(x_shape, jnp.float32)
    vars_shapes = jax.eval_shape(lambda: model.init({"params": KEY}, x))
    out = jax.eval_shape(
        lambda v: model.apply(v, x), vars_shapes)
    return out.shape


class TestParamParity:
    """Counts measured from /root/reference with matching arguments."""

    def test_unet(self):
        g = get_generator("unet", in_channels=3, out_channels=1, ngf=64,
                          drop_rate=0.05, no_conv_t=False, activation="tanh")
        assert param_count(g, (1, 64, 64, 3)) == 39_392_512

    def test_mnet_nn_upconv(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=64,
                          drop_rate=0.05, no_conv_t=True, activation="tanh")
        assert param_count(g, (1, 64, 64, 3)) == 12_411_648

    def test_mnet_convtranspose(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=64,
                          drop_rate=0.05, no_conv_t=False, activation="tanh")
        assert param_count(g, (1, 64, 64, 3)) == 16_656_000

    def test_denseunet(self):
        g = get_generator("denseunet", in_channels=3, out_channels=1, ngf=48,
                          drop_rate=0.0, no_conv_t=False, activation=None)
        assert param_count(g, (1, 64, 64, 3)) == 820_800

    def test_pix2pix(self):
        g = get_generator("stcgan", in_channels=3, out_channels=1, ngf=64)
        assert param_count(g, (1, 64, 64, 3)) == 54_409_857

    def test_patchgan(self):
        d = get_discriminator("patchgan", in_channels=4, out_channels=1,
                              ndf=64, use_sigmoid=False)
        assert param_count(d, (1, 64, 64, 4)) == 1_845_568

    def test_began(self):
        d = get_discriminator("began", in_channels=4, out_channels=1, ndf=64)
        assert param_count(d, (1, 64, 64, 4)) == 335_937

    def test_nlayer(self):
        d = get_discriminator("stcgan", in_channels=4, out_channels=1, ndf=64)
        assert param_count(d, (1, 64, 64, 4)) == 2_766_657

    def test_dummy(self):
        d = get_discriminator("dummy", in_channels=4, out_channels=1)
        assert param_count(d, (1, 64, 64, 4)) == 5


class TestShapes:
    def test_generators_preserve_resolution(self):
        for name in ["unet", "mnet"]:
            g = get_generator(name, in_channels=3, out_channels=1, ngf=8)
            assert out_shape(g, (2, 32, 32, 3)) == (2, 32, 32, 1)

    def test_g2_shape(self):
        # G2 takes image+matte (4ch) -> 3ch shadow-free
        g = get_generator("mnet", in_channels=4, out_channels=3, ngf=8)
        assert out_shape(g, (2, 32, 32, 4)) == (2, 32, 32, 3)

    def test_patchgan_logit_map(self):
        d = get_discriminator("patchgan", in_channels=4, out_channels=1,
                              ndf=8)
        # 64 -> /2 /2 /2 = 8 (reference observed (1,1,8,8))
        assert out_shape(d, (1, 64, 64, 4)) == (1, 8, 8, 1)

    def test_nlayer_logit_map(self):
        d = get_discriminator("stcgan", in_channels=4, out_channels=1, ndf=8)
        # reference observed (1,1,6,6) at 64x64 input
        assert out_shape(d, (1, 64, 64, 4)) == (1, 6, 6, 1)

    def test_began_reconstruction_shape(self):
        d = get_discriminator("began", in_channels=4, out_channels=3, ndf=8)
        assert out_shape(d, (1, 32, 32, 4)) == (1, 32, 32, 3)

    def test_pix2pix_odd_size(self):
        # full-res ISTD inference path: 480x640 hits an odd 15 at level 5
        g = get_generator("stcgan", in_channels=3, out_channels=3, ngf=4)
        assert out_shape(g, (1, 480, 640, 3)) == (1, 480, 640, 3)


class TestBehaviour:
    def test_forward_runs_and_is_finite(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=8)
        x = jnp.ones((1, 32, 32, 3))
        v = g.init({"params": KEY}, x)
        y = g.apply(v, x)
        assert bool(jnp.isfinite(y).all())
        assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0  # tanh

    def test_train_mode_updates_batch_stats(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=8)
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        v = g.init({"params": KEY}, x)
        y, updates = g.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": KEY})
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_dropout_needs_train_rng_only(self):
        g = get_generator("unet", in_channels=3, out_channels=1, ngf=8,
                          drop_rate=0.5)
        x = jax.random.normal(KEY, (2, 32, 32, 3))
        v = g.init({"params": KEY}, x)
        # eval path: deterministic, no rng required
        y1 = g.apply(v, x)
        y2 = g.apply(v, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        # train path: stochastic with rng
        t1, _ = g.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)})
        t2, _ = g.apply(v, x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(2)})
        assert not np.allclose(np.asarray(t1), np.asarray(t2))

    def test_registry_case_insensitive(self):
        g1 = get_generator("MNET", in_channels=3, out_channels=1)
        g2 = get_generator("mnet", in_channels=3, out_channels=1)
        assert type(g1) is type(g2)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            get_generator("resnet", in_channels=3, out_channels=1)


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"),
    reason="torch reference not mounted")
class TestTorchReferenceParity:
    """Live parity against the mounted reference (param counts)."""

    def test_live_param_counts(self):
        import sys
        sys.path.insert(0, "/root/reference")
        try:
            from src import networks as ref_networks
        except Exception as e:  # torch missing etc.
            pytest.skip(f"reference import failed: {e}")
        ref = ref_networks.get_generator(
            "mnet", in_channels=3, out_channels=1, ngf=32, drop_rate=0.0,
            no_conv_t=True, use_selu=False, activation="tanh")
        ref_n = sum(p.numel() for p in ref.parameters())
        ours = get_generator("mnet", in_channels=3, out_channels=1, ngf=32,
                             no_conv_t=True, activation="tanh")
        assert param_count(ours, (1, 64, 64, 3)) == ref_n


class TestSubpixelUpsample:
    """The subpixel-decomposed NN-upsample+conv (models/layers.py
    _subpixel_nn_conv) is bit-equivalent to the naive materialized form."""

    def test_matches_naive_path(self):
        from shadow_removal_istd_tpu.models.layers import Upsample
        rng = np.random.default_rng(0)
        for (h, w, cin, cout, bias) in [(8, 8, 6, 5, False),
                                        (5, 7, 3, 4, True),
                                        (1, 1, 2, 2, False)]:
            x = jnp.asarray(rng.normal(size=(2, h, w, cin))
                            .astype(np.float32))
            fast = Upsample(cout, no_conv_t=True, use_bias=bias,
                            subpixel=True)
            slow = Upsample(cout, no_conv_t=True, use_bias=bias,
                            subpixel=False)
            v = slow.init(KEY, x)
            v = jax.tree.map(
                lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), v)
            with jax.default_matmul_precision("highest"):
                yf = fast.apply(v, x)
                ys = slow.apply(v, x)
            assert yf.shape == ys.shape == (2, 2 * h, 2 * w, cout)
            np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                                       atol=2e-5)

    def test_param_tree_unchanged(self):
        # same param names/shapes either way: checkpoints + torch bridge
        from shadow_removal_istd_tpu.models.layers import Upsample
        x = jnp.zeros((1, 4, 4, 3))
        vf = jax.eval_shape(
            lambda: Upsample(8, no_conv_t=True, subpixel=True).init(KEY, x))
        vs = jax.eval_shape(
            lambda: Upsample(8, no_conv_t=True, subpixel=False).init(KEY, x))
        assert jax.tree_util.tree_structure(vf) == \
            jax.tree_util.tree_structure(vs)

    def test_split_parts_match_concat(self):
        # conv(concat(parts)) == sum of kernel-slice convs per part —
        # the split-skip form never materializes the concat
        from shadow_removal_istd_tpu.models.layers import Upsample
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(2, 6, 5, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 6, 5, 3)).astype(np.float32))
        up = Upsample(7, no_conv_t=True, use_bias=False, subpixel=True)
        v = up.init(KEY, jnp.concatenate([a, b], axis=-1))
        v = jax.tree.map(
            lambda t: jnp.asarray(rng.normal(size=t.shape), t.dtype), v)
        with jax.default_matmul_precision("highest"):
            y_cat = up.apply(v, jnp.concatenate([a, b], axis=-1))
            y_split = up.apply(v, (a, b))
        np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                                   atol=2e-5)


class TestMNetSplitSkip:
    """MNet(split_skip=True) carries decoder skips as (y, link) tuples;
    eval output must match the concat form exactly and the param tree
    must be unchanged (checkpoints/bridge compatibility)."""

    @pytest.mark.slow
    def test_eval_equivalence_and_param_tree(self):
        from shadow_removal_istd_tpu.models.mnet import MNet
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        base = MNet(out_channels=1, ngf=8, split_skip=False)
        split = MNet(out_channels=1, ngf=8, split_skip=True)
        v = base.init(KEY, x, train=False)
        vs = jax.eval_shape(lambda: split.init(KEY, x, train=False))
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(vs))
        with jax.default_matmul_precision("highest"):
            y0 = base.apply(v, x, train=False)
            y1 = split.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=2e-5)

    @pytest.mark.slow
    def test_gated_phase_affine_size(self):
        # >=4500 pre-upsample area takes the defer-d2s fast path inside
        # the split form; both fast paths must compose. At 288x288 the
        # outermost _Up sees 72x72 = 5184 >= 4500 (the gate reads the
        # PRE-upsample area, image area / 16), so the parts-loop
        # defer_d2s branch in L.Upsample actually executes — 96x96
        # (24x24 = 576) never reaches it.
        from shadow_removal_istd_tpu.models.mnet import MNet
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 288, 288, 3)).astype(np.float32))
        base = MNet(out_channels=1, ngf=8, split_skip=False)
        split = MNet(out_channels=1, ngf=8, split_skip=True)
        v = base.init(KEY, x, train=False)
        with jax.default_matmul_precision("highest"):
            y0 = base.apply(v, x, train=False)
            y1 = split.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=2e-5)

    def test_train_path_ignores_flag(self):
        from shadow_removal_istd_tpu.models.mnet import MNet
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        base = MNet(out_channels=1, ngf=8, drop_rate=0.1, split_skip=False)
        split = MNet(out_channels=1, ngf=8, drop_rate=0.1, split_skip=True)
        v = base.init(KEY, x, train=False)
        y0, s0 = base.apply(v, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": KEY})
        y1, s1 = split.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": KEY})
        assert jnp.array_equal(y0, y1)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), s0, s1)


class TestFlopCounter:
    """utils/flops.py analytic MXU FLOP counts on known shapes."""

    def test_dot_and_conv(self):
        from shadow_removal_istd_tpu.utils.flops import count_flops

        a = jnp.zeros((4, 8), jnp.float32)
        b = jnp.zeros((8, 16), jnp.float32)
        assert count_flops(jnp.matmul, a, b) == 2 * 4 * 8 * 16

        x = jnp.zeros((2, 10, 10, 3), jnp.float32)
        k = jnp.zeros((3, 3, 3, 7), jnp.float32)
        conv = lambda x, k: jax.lax.conv_general_dilated(  # noqa: E731
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        assert count_flops(conv, x, k) == 2 * (2 * 10 * 10 * 7) * (3 * 3 * 3)

    def test_scan_multiplies_and_dilation_discounts(self):
        from shadow_removal_istd_tpu.utils.flops import count_flops

        a = jnp.zeros((4, 8), jnp.float32)
        b = jnp.zeros((8, 16), jnp.float32)

        def scanned(a, b):
            def body(c, _):
                return c + a @ b, None
            out, _ = jax.lax.scan(body, jnp.zeros((4, 16)), None, length=5)
            return out
        assert count_flops(scanned, a, b) == 5 * 2 * 4 * 8 * 16

        # transposed conv: only 1/prod(lhs_dilation) of taps are useful
        x = jnp.zeros((1, 8, 8, 4), jnp.float32)
        k = jnp.zeros((4, 4, 4, 6), jnp.float32)
        tconv = lambda x, k: jax.lax.conv_transpose(  # noqa: E731
            x, k, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = count_flops(tconv, x, k)
        assert got == 2 * (1 * 16 * 16 * 6) * (4 * 4 * 4) / 4


class TestSizeDivisibilityErrors:
    """Indivisible input sizes must fail with the real rule up front,
    not a cryptic skip-concat shape error deep in the net."""

    def test_mnet_clear_error(self):
        import jax
        from shadow_removal_istd_tpu.models import get_generator
        m = get_generator("mnet", in_channels=3, out_channels=1, ngf=4)
        with pytest.raises(ValueError, match="divisible by 32"):
            m.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 48, 64, 3)))

    def test_denseunet_clear_error(self):
        import jax
        from shadow_removal_istd_tpu.models import get_generator
        m = get_generator("denseunet", in_channels=3, out_channels=1,
                          ngf=8)
        with pytest.raises(ValueError, match="divisible by 32"):
            m.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 48, 64, 3)))

    def test_unet_clear_error(self):
        import jax
        from shadow_removal_istd_tpu.models import get_generator
        m = get_generator("unet", in_channels=3, out_channels=1, ngf=4)
        with pytest.raises(ValueError, match="divisible by 16"):
            m.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 24, 32, 3)))
