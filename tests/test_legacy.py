"""Legacy-tree (STCGAN/) capability tests: plateau schedule, resize
stages, DCGAN init, mask-stream training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.engine.schedules import ReduceLROnPlateau


class TestReduceLROnPlateau:
    def test_matches_torch_scheduler(self):
        torch = pytest.importorskip("torch")
        lin = torch.nn.Linear(1, 1)
        opt = torch.optim.Adam(lin.parameters(), lr=1.0)
        ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, cooldown=10, min_lr=1e-7, factor=0.8)
        ours = ReduceLROnPlateau(base_lr=1.0, factor=0.8, cooldown=10,
                                 min_lr=1e-7)
        rng = np.random.default_rng(0)
        # plateau-ish series: improves early then stalls
        series = list(np.linspace(10, 5, 8)) + [5.0] * 40 \
            + list(rng.uniform(4.9, 5.1, 40))
        for i, m in enumerate(series):
            ref.step(m)
            ours.step(float(m))
            torch_lr = opt.param_groups[0]["lr"]
            assert ours.current_lr == pytest.approx(torch_lr, rel=1e-6), \
                f"step {i}: ours={ours.current_lr} torch={torch_lr}"

    def test_min_lr_floor(self):
        s = ReduceLROnPlateau(base_lr=1e-6, factor=0.1, patience=0,
                              cooldown=0, min_lr=1e-7)
        for _ in range(10):
            s.step(1.0)
        assert s.current_lr == pytest.approx(1e-7)

    def test_state_roundtrip(self):
        s = ReduceLROnPlateau(base_lr=1.0)
        for m in [3.0, 2.0, 2.0, 2.0]:
            s.step(m)
        d = s.state_dict()
        s2 = ReduceLROnPlateau(base_lr=1.0)
        s2.load_state_dict(d)
        assert s2.best == s.best and s2.current_lr == s.current_lr


class TestDCGANInit:
    def test_distributions(self):
        from shadow_removal_istd_tpu.models import get_generator
        from shadow_removal_istd_tpu.models.layers import apply_dcgan_init
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=16)
        v = g.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 32, 32, 3)))
        params = apply_dcgan_init(jax.random.key(1), v["params"])
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        kernels = [np.asarray(l) for p, l in flat if "kernel" in str(p[-1])]
        scales = [np.asarray(l) for p, l in flat if "scale" in str(p[-1])]
        biases = [np.asarray(l) for p, l in flat if "bias" in str(p[-1])]
        big = np.concatenate([k.ravel() for k in kernels])
        assert abs(big.mean()) < 0.005 and abs(big.std() - 0.02) < 0.005
        s = np.concatenate([x.ravel() for x in scales])
        assert abs(s.mean() - 1.0) < 0.01  # standard DCGAN BN scale
        assert all(np.all(b == 0) for b in biases)

    def test_bn_compat_mode(self):
        from shadow_removal_istd_tpu.models import get_generator
        from shadow_removal_istd_tpu.models.layers import apply_dcgan_init
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=16)
        v = g.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 32, 32, 3)))
        params = apply_dcgan_init(jax.random.key(1), v["params"],
                                  bn_scale_mean=0.0)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        s = np.concatenate([np.asarray(l).ravel() for p, l in flat
                            if "scale" in str(p[-1])])
        assert abs(s.mean()) < 0.01  # the reference's N(0,.02) behaviour


class TestLegacyFlagGuards:
    def test_no_batch_norm_flags_refuse_loudly(self):
        """--no-batch-norm-G/-D are parsed-but-unimplemented in the
        reference (STCGAN/main.py:236-239 — parsed, never read). A
        behavior-changing-sounding flag must not be a silent no-op:
        here passing it refuses to run."""
        import pytest

        from shadow_removal_istd_tpu.cli.stcgan_main import (
            build_parser,
            main,
        )
        args = build_parser().parse_args(
            ["--tasks", "train", "--no-batch-norm-D"])
        with pytest.raises(SystemExit, match="not.*implemented"):
            main(args)


class TestLegacyTrainer:
    def test_legacy_config_end_to_end(self, tmp_path):
        """plateau schedule + resize stages + mask stream + dcgan init."""
        from shadow_removal_istd_tpu.data.synthetic import synthetic_triplets
        from shadow_removal_istd_tpu.engine import (
            RunConfig,
            TrainConfig,
            Trainer,
        )
        data = synthetic_triplets(4, 48, 64, seed=0)
        streams = {k: data[k] for k in ("img", "mask", "target")}
        cfg = TrainConfig(
            net_g="mnet", net_d="patchgan", ngf=4, ndf=4, droprate=0.0,
            lambda1=5, lambda2=0.1, lambda3=0.1, lambda4=0, lambda5=0,
            image_size=32, batch_size=4, lr_schedule="plateau",
            aug_resize=(72, 96), valid_resize=(64, 64),
            infer_resize=(24, 32), dcgan_init=True,
            train_datas=("img", "mask", "target"), use_visual_loss=False)
        run = RunConfig(
            logs_dir=str(tmp_path / "l"), weights_dir=str(tmp_path / "w"),
            infered_dir=str(tmp_path / "o"),
            checkpoint_path=str(tmp_path / "c.msgpack"),
            log_every=1, valid_every=1, vis_every=5, save_every=5)
        tr = Trainer(cfg, run, train_streams=streams,
                     valid_streams=streams,
                     valid_names=[f"f{i}" for i in range(4)])
        assert tr.plateau_g is not None
        tr.train(1)
        n = tr.infer()
        assert n == 4
        import os
        from shadow_removal_istd_tpu.utils.image_io import imread_color
        out = imread_color(os.path.join(str(tmp_path / "o"),
                                        "shadowless", "f0.png"))
        assert out.shape == (24, 32, 3)  # infer_resize applied
