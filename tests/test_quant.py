"""int8 PTQ serving path: BN folding exactness + quantization accuracy."""
import numpy as np

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.engine import TrainConfig, build_models, \
    init_state
from shadow_removal_istd_tpu.models.mnet import MNet
from shadow_removal_istd_tpu.models.quant import (
    calibrate_mnet,
    fold_mnet,
    fold_stacked,
    make_stacked_int8,
    mnet_apply_folded,
    quantize_mnet,
    quantize_stacked,
)


def _trained_like_variables(key, model, x, steps: int = 3):
    """Variables with non-trivial batch_stats (a few train-mode passes)."""
    v = model.init(key, x, train=False)
    params, stats = v["params"], v["batch_stats"]
    for i in range(steps):
        xb = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        _, mut = model.apply({"params": params, "batch_stats": stats},
                             jnp.tanh(xb), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(i)})
        stats = mut["batch_stats"]
    return params, stats


class TestFolding:
    def test_folded_forward_matches_eval_apply(self):
        model = MNet(out_channels=1, ngf=8, drop_rate=0.0)
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
        params, stats = _trained_like_variables(jax.random.key(0), model, x)
        with jax.default_matmul_precision("highest"):
            ref = model.apply({"params": params, "batch_stats": stats},
                              x, train=False)
            folded = fold_mnet(params, stats)
            got = mnet_apply_folded(folded, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_observe_returns_all_sites(self):
        model = MNet(out_channels=1, ngf=8)
        x = jnp.zeros((1, 32, 32, 3))
        params, stats = _trained_like_variables(jax.random.key(0), model, x)
        folded = fold_mnet(params, stats)
        _, amax = mnet_apply_folded(folded, x, observe=True)
        assert set(amax) == {"stem", "down0", "down1", "down2", "down3",
                             "up0", "up1", "up2", "up3", "final"}


class TestInt8:
    def test_int8_close_to_f32(self):
        model = MNet(out_channels=1, ngf=8, drop_rate=0.0)
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
        params, stats = _trained_like_variables(jax.random.key(0), model, x)
        folded = fold_mnet(params, stats)
        scales = calibrate_mnet(folded, [x])
        qp = quantize_mnet(folded, scales)
        ref = mnet_apply_folded(folded, x)
        got = jax.jit(lambda q, t: mnet_apply_folded(
            None, t, qparams=q))(qp, x)
        err = np.asarray(got - ref)
        # outputs live in [-1, 1]; PTQ noise must stay small
        rms = float(np.sqrt(np.mean(err ** 2)))
        psnr = 20 * np.log10(2.0 / max(rms, 1e-12))
        assert psnr > 35.0, f"int8 PSNR vs f32 too low: {psnr:.1f} dB"

    def test_selective_encoder_only(self):
        """quant_sites=ENCODER_SITES: encoder convs run s8, decoder
        runs the folded weights — accuracy must sit BETWEEN full int8
        and exact f32 (strictly >= the full-int8 bar), and with an
        empty site set the graph must equal the folded forward
        bit-for-bit (no quantization applied anywhere)."""
        from shadow_removal_istd_tpu.models.quant import ENCODER_SITES
        model = MNet(out_channels=1, ngf=8, drop_rate=0.0)
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
        params, stats = _trained_like_variables(jax.random.key(0), model, x)
        folded = fold_mnet(params, stats)
        qp = quantize_mnet(folded, calibrate_mnet(folded, [x]))
        ref = mnet_apply_folded(folded, x)
        enc = jax.jit(lambda f, q, t: mnet_apply_folded(
            f, t, qparams=q, quant_sites=ENCODER_SITES))(folded, qp, x)
        rms = float(np.sqrt(np.mean(np.asarray(enc - ref) ** 2)))
        assert 20 * np.log10(2.0 / max(rms, 1e-12)) > 35.0
        none_q = jax.jit(lambda f, q, t: mnet_apply_folded(
            f, t, qparams=q, quant_sites=frozenset()))(folded, qp, x)
        np.testing.assert_array_equal(np.asarray(none_q), np.asarray(ref))

    def test_weights_are_int8(self):
        model = MNet(out_channels=1, ngf=8)
        x = jnp.ones((1, 32, 32, 3))
        params, stats = _trained_like_variables(jax.random.key(0), model, x)
        folded = fold_mnet(params, stats)
        qp = quantize_mnet(folded, calibrate_mnet(folded, [x]))
        for k, v in qp.items():
            if k.endswith("_w"):
                assert v.dtype == jnp.int8, k

    def test_stacked_int8_pipeline(self):
        cfg = TrainConfig(ngf=8, ndf=8, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          steps_per_epoch=1, nn_upconv=True)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        x = jax.random.uniform(jax.random.key(2), (2, 32, 32, 3)) * 2 - 1
        q1, q2 = quantize_stacked(state, [x])
        run = jax.jit(make_stacked_int8(q1, q2))
        m, y = run(x)
        assert m.shape == (2, 32, 32, 1) and y.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(m)).all()
        assert np.isfinite(np.asarray(y)).all()
        # must track the folded-f32 stacked forward closely
        f1, f2 = fold_stacked(state)
        m_ref = mnet_apply_folded(f1, x)
        y_ref = mnet_apply_folded(
            f2, jnp.concatenate([x, m_ref], axis=-1))
        rms = float(np.sqrt(np.mean(np.asarray(y - y_ref) ** 2)))
        assert 20 * np.log10(2.0 / max(rms, 1e-12)) > 30.0
