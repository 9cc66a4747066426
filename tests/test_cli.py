"""CLI tests: flag surface parity, run-dir naming, end-to-end train+infer."""
import json
import os

import numpy as np
import pytest

from shadow_removal_istd_tpu.cli.main import (
    build_parser,
    load_args,
    main,
    makedirs,
    snapshotargs,
    str2bool,
)


class TestFlagSurface:
    def test_reference_flags_accepted(self):
        # every public flag of the reference CLI (src/main.py:132-329)
        parser = build_parser()
        args = parser.parse_args([
            "--tasks", "train", "infer",
            "--devices", "cpu",
            "--batch-size", "4", "--epochs", "2000",
            "--data-dir", "/data/ISTD", "--workers", "4",
            "--image-size", "256", "--aug-scale", "0.05",
            "--aug-angle", "15",
            "--net-G", "mnet", "--net-D", "patchgan",
            "--ngf", "64", "--ndf", "64", "--droprate", "0.05",
            "--lr-D", "0.0001", "--lr-G", "0.0005", "--decay", "0.003",
            "--beta1", "0.5", "--beta2", "0.999",
            "--lambda1", "5", "--lambda2", "0.5", "--lambda3", "0.5",
            "--lambda4", "5", "--lambda5", "50",
            "--manual_seed", "38107943",
            "--D-loss-fn", "leastsquare", "--D-type", "rel_avg",
            "--softadapt", "--SELU", "no", "--NN-upconv", "yes",
            "--activation", "tanh",
            "--log-every", "3", "--valid-every", "10",
            "--vis-every", "50", "--save-every", "50",
            "--weights", "./w", "--infered", "./i", "--logs", "./l",
        ])
        assert args.tasks == ["train", "infer"]
        assert args.net_G == "mnet" and args.NN_upconv is True
        assert args.D_loss_fn == "leastsquare"

    def test_defaults_match_reference(self):
        args = build_parser().parse_args(["--tasks", "train"])
        assert args.batch_size == 16 and args.epochs == 100000
        assert args.lr_G == 0.0005 and args.lr_D == 0.0001
        assert args.lambda1 == 5 and args.lambda5 == 50
        assert args.manual_seed == 38107943
        assert args.net_G == "mnet" and args.net_D == "patchgan"
        assert args.activation == "tanh"

    def test_remat_flag(self):
        parser = build_parser()
        assert parser.parse_args(["--tasks", "train"]).remat is False
        assert parser.parse_args(["--tasks", "train",
                                  "--remat"]).remat is True

    def test_str2bool(self):
        assert str2bool("yes") and str2bool("True") and str2bool("1")
        assert not str2bool("no") and not str2bool("0")

    def test_select_mesh_spatial(self):
        from shadow_removal_istd_tpu.cli.main import _select_mesh

        mesh = _select_mesh(["8"], batch_size=16, spatial_shard=4)
        assert mesh.shape == {"data": 2, "spatial": 4}
        # spatial-only: batch too small for a data axis
        mesh = _select_mesh(["8"], batch_size=1, spatial_shard=8)
        assert mesh.shape == {"data": 1, "spatial": 8}
        # capped to available devices
        mesh = _select_mesh(["8"], batch_size=4, spatial_shard=99)
        assert mesh.shape["spatial"] == 8
        # default stays the 1-D data mesh
        mesh = _select_mesh(["8"], batch_size=16)
        assert dict(mesh.shape) == {"data": 8}

    def test_select_mesh_model_shard(self):
        from shadow_removal_istd_tpu.cli.main import _select_mesh

        mesh = _select_mesh(["8"], batch_size=16, model_shard=4)
        assert dict(mesh.shape) == {"data": 2, "model": 4}
        # TP-only: batch too small for a data axis
        mesh = _select_mesh(["8"], batch_size=1, model_shard=8)
        assert dict(mesh.shape) == {"data": 1, "model": 8}
        # capped to available devices
        mesh = _select_mesh(["8"], batch_size=4, model_shard=99)
        assert mesh.shape["model"] == 8
        # spatial x model composes into the 3-D mesh
        mesh = _select_mesh(["8"], batch_size=4, spatial_shard=2,
                            model_shard=2)
        assert dict(mesh.shape) == {"data": 2, "spatial": 2, "model": 2}
        # over-subscribed composition: spatial capped so sp*mp fits
        mesh = _select_mesh(["8"], batch_size=4, spatial_shard=8,
                            model_shard=4)
        assert dict(mesh.shape) == {"data": 1, "spatial": 2, "model": 4}

    def test_rundir_naming(self, tmp_path):
        # run-dir names encode lr / D-type / D-loss (src/main.py:100-113)
        args = build_parser().parse_args(
            ["--tasks", "train", "--D-type", "rel_avg",
             "--D-loss-fn", "leastsquare",
             "--weights", str(tmp_path / "w"), "--logs", str(tmp_path / "l")])
        makedirs(args)
        assert args.weights.endswith("_lr0.00050_RaLSGAN")
        assert os.path.isdir(args.weights) and os.path.isdir(args.logs)

    def test_args_snapshot_and_reload(self, tmp_path):
        args = build_parser().parse_args(
            ["--tasks", "train", "--ngf", "32",
             "--logs", str(tmp_path)])
        snapshotargs(args)
        snap = tmp_path / "args.json"
        assert snap.is_file()
        loaded = json.loads(snap.read_text())
        assert loaded["ngf"] == 32
        # reload into a fresh args with different ngf; preserved keys
        # (weights/logs/load_*) keep the new invocation's values
        args2 = build_parser().parse_args(
            ["--tasks", "infer", "--ngf", "64",
             "--logs", "/other", "--load-args", str(snap)])
        load_args(args2)
        assert args2.ngf == 32          # restored
        assert args2.logs == "/other"   # preserved

    def test_snapshot_and_dirs_precede_load_args(self, tmp_path):
        # reference order (src/main.py:24-40): dirs + args.json come
        # from the CURRENT invocation; --load-args overlays afterwards
        from shadow_removal_istd_tpu.cli.main import prepare_run_dirs
        old = build_parser().parse_args(
            ["--tasks", "train", "--lr-G", "0.001",
             "--logs", str(tmp_path)])
        snapshotargs(old)
        snap = tmp_path / "args.json"
        new = build_parser().parse_args(
            ["--tasks", "train", "--load-args", str(snap),
             "--weights", str(tmp_path / "w"),
             "--logs", str(tmp_path / "new")])
        prepare_run_dirs(new)
        # run-dir suffix encodes the DEFAULT lr of this invocation,
        # not the loaded 0.001
        assert "_lr0.00050_" in new.logs and os.path.isdir(new.logs)
        with open(os.path.join(new.logs, "args.json")) as fp:
            written = json.load(fp)
        assert written["lr_G"] == 0.0005  # snapshot = typed flags
        assert new.lr_G == 0.001          # ...then the overlay applied


@pytest.mark.slow
class TestEndToEnd:
    def test_train_then_infer(self, tmp_path):
        from shadow_removal_istd_tpu.data.synthetic import write_istd_layout
        root = str(tmp_path / "istd")
        write_istd_layout(root, n_train=4, n_test=2, h=64, w=64)
        common = [
            "--data-dir", root, "--devices", "cpu",
            "--net-G", "mnet", "--net-D", "patchgan",
            "--ngf", "4", "--ndf", "4", "--droprate", "0",
            "--image-size", "32", "--batch-size", "2",
            "--log-every", "1", "--valid-every", "1",
            "--vis-every", "1", "--save-every", "1",
            "--weights", str(tmp_path / "w"),
            "--logs", str(tmp_path / "l"),
            "--infered", str(tmp_path / "out"),
        ]
        # default lambdas + no VGG weights must fail fast (the reference
        # trains with the perceptual terms; silently dropping them would
        # change the objective)
        with pytest.raises(ValueError, match="visual loss"):
            main(build_parser().parse_args(
                ["--tasks", "train", "--epochs", "1"] + common))

        args = build_parser().parse_args(
            ["--tasks", "train", "--epochs", "1", "--allow-missing-vgg",
             "--eval-metrics"] + common)
        main(args)
        weights_dir = args.weights  # suffixed by makedirs
        files = os.listdir(weights_dir)
        assert any(f.startswith("G1_MNet_latest") for f in files)
        assert "checkpoint.msgpack" in files
        # --eval-metrics ran the ISTD LAB protocol during validation
        logs = []
        for dirpath, _, fnames in os.walk(args.logs):
            logs += [os.path.join(dirpath, f) for f in fnames
                     if f.endswith(".log")]
        assert logs
        text = "".join(open(f).read() for f in logs)
        assert "eval protocol @ epoch" in text

        args2 = build_parser().parse_args(
            ["--tasks", "infer",
             "--load-checkpoint", os.path.join(weights_dir,
                                               "checkpoint.msgpack"),
             "--export-stablehlo", str(tmp_path / "model.shlo"),
             "--export-shape", "32", "32"]
            + common)
        main(args2)
        out = os.path.join(str(tmp_path / "out"), "shadowless", "istd")
        assert len(os.listdir(out)) == 2
        matte0 = os.path.join(str(tmp_path / "out"), "matte", "istd")
        assert len(os.listdir(matte0)) == 2
        # write-behind PNG outputs must be intact, full-size images
        from shadow_removal_istd_tpu.utils.image_io import imread_color
        for d, ch in ((out, 3), (matte0, 3)):
            for f in os.listdir(d):
                img = imread_color(os.path.join(d, f))
                assert img.shape == (64, 64, ch)
                assert img.std() > 0  # not a zero/truncated file
        # serving artifact: self-contained, loadable, runnable
        from shadow_removal_istd_tpu.tools.export import load_exported
        run = load_exported(str(tmp_path / "model.shlo"))
        import numpy as np
        import jax.numpy as jnp
        m, y = run(jnp.zeros((1, 32, 32, 3), jnp.float32))
        assert m.shape == (1, 32, 32, 1) and y.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(y)).all()
