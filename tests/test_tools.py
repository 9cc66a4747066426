"""Offline tooling tests: sp preprocessing, color adjustment, VGG
conversion, experiment runner, logging utils."""
import os

import numpy as np
import pytest


class TestPreprocess:
    def test_sp_roundtrip(self, rng):
        from shadow_removal_istd_tpu.tools.preprocess import (
            apply_sp,
            compute_sp,
        )
        shadowed = rng.integers(1, 255, (16, 16, 3), np.uint8)
        free = rng.integers(0, 256, (16, 16, 3), np.uint8)
        sp = compute_sp(shadowed, free)
        restored = apply_sp(shadowed, sp)
        np.testing.assert_allclose(restored, free, atol=1)

    def test_zero_pixels_clamped(self):
        from shadow_removal_istd_tpu.tools.preprocess import compute_sp
        shadowed = np.zeros((2, 2, 3), np.uint8)
        free = np.full((2, 2, 3), 100, np.uint8)
        sp = compute_sp(shadowed, free)
        assert np.isfinite(sp).all()
        np.testing.assert_array_equal(sp, 100.0)

    def test_process_split(self, tmp_path):
        from shadow_removal_istd_tpu.data.synthetic import write_istd_layout
        from shadow_removal_istd_tpu.tools.preprocess import process_split
        root = str(tmp_path)
        write_istd_layout(root, n_train=2, n_test=1, h=24, w=32)
        n = process_split(root, "train", save_sp=True, save_img=True)
        assert n == 2
        sp_files = os.listdir(os.path.join(root, "train", "sp"))
        assert len(sp_files) == 2
        sp = np.load(os.path.join(root, "train", "sp", sp_files[0]))
        assert sp.shape == (24, 32, 3)

    @pytest.mark.parametrize("ksize,deg", [(5, 1), (3, 2)])
    def test_polyfit_sp_matches_per_pixel_oracle(self, rng, ksize, deg):
        """The batched closed-form polyfit sp equals the reference's
        dormant per-pixel numpy.polynomial fit (src/preprocess.py:18-24
        / src/utils.py:17-44), run literally pixel by pixel."""
        from numpy.polynomial import polynomial as P

        from shadow_removal_istd_tpu.tools.preprocess import (
            _HAT_LUT,
            _bgr_to_gray_u8,
            compute_sp_polyfit,
        )
        # gray levels away from 0/255 keep every hat weight positive
        # (a zero-weight window is the degenerate min-norm case,
        # covered separately below)
        shadowed = rng.integers(40, 200, (8, 9, 3), np.uint8)
        free = rng.integers(40, 200, (8, 9, 3), np.uint8)
        got = compute_sp_polyfit(shadowed, free, ksize=ksize, deg=deg)
        assert got.shape == (8, 9, 3, deg + 1)

        border = (ksize - 1) // 2
        pad2 = ((border, border), (border, border))
        img = np.pad(shadowed, pad2 + ((0, 0),), mode="edge")
        gt = np.pad(free, pad2 + ((0, 0),), mode="edge")
        weight = _HAT_LUT[_bgr_to_gray_u8(gt)]
        w2 = np.array(
            [ksize - abs(i - border) - abs(j - border)
             for i in range(ksize) for j in range(ksize)], float)
        for r in range(0, 8, 3):
            for c in range(0, 9, 4):
                for ch in range(3):
                    x = img[r:r + ksize, c:c + ksize, ch].ravel()
                    y = gt[r:r + ksize, c:c + ksize, ch].ravel()
                    w1 = weight[r:r + ksize, c:c + ksize].ravel()
                    coef = P.polyfit(x.astype(float), y.astype(float),
                                     deg, w=w1 * w2)
                    np.testing.assert_allclose(
                        got[r, c, ch], coef, rtol=1e-4, atol=1e-4,
                        err_msg=f"pixel ({r},{c},{ch})")

    def test_polyfit_sp_degenerate_windows_finite(self):
        # all-black shadow-free -> gray 0 -> hat weight 0 everywhere:
        # the fit is underdetermined; min-norm solution must be finite
        from shadow_removal_istd_tpu.tools.preprocess import (
            compute_sp_polyfit,
        )
        shadowed = np.full((6, 6, 3), 100, np.uint8)  # constant patch
        free = np.zeros((6, 6, 3), np.uint8)
        sp = compute_sp_polyfit(shadowed, free)
        assert np.isfinite(sp).all()

    def test_polyfit_sp_roundtrip_and_cli(self, tmp_path, rng):
        """--method polyfit: the restored image approximates the
        shadow-free target, and the CLI writes sp_poly/ npy files with
        the (H, W, 3, deg+1) shape."""
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.tools.preprocess import (
            apply_sp_poly,
            compute_sp_polyfit,
            main,
        )
        root = str(tmp_path)
        write_istd_layout(root, n_train=2, n_test=1, h=24, w=32)
        main(["--path", root, "--subset", "train", "--method", "polyfit",
              "--save-img", "true"])
        sp_dir = os.path.join(root, "train", "sp_poly")
        files = sorted(os.listdir(sp_dir))
        assert len(files) == 2
        sp = np.load(os.path.join(sp_dir, files[0]))
        assert sp.shape == (24, 32, 3, 2)
        # polyfit restored images get their own directory so the two
        # methods' outputs never clobber each other
        assert os.path.isdir(os.path.join(root, "train",
                                          "sp_poly_restored_img"))
        assert not os.path.isdir(os.path.join(root, "train",
                                              "sp_restored_img"))
        # a smooth synthetic pair: the local linear fit restores the
        # target to within a few gray levels
        from shadow_removal_istd_tpu.utils.image_io import imread_color
        a = imread_color(os.path.join(root, "train", "train_A",
                                      files[0].replace(".npy", ".png")))
        c = imread_color(os.path.join(root, "train", "train_C_fixed",
                                      files[0].replace(".npy", ".png")))
        restored = apply_sp_poly(a, compute_sp_polyfit(a, c))
        err = np.abs(restored.astype(float) - c.astype(float)).mean()
        base = np.abs(a.astype(float) - c.astype(float)).mean()
        assert err < base * 0.5 and err < 10.0

    def test_save_flags_parse_false(self, tmp_path):
        # the reference's type=bool parses "--save-img false" as True
        # (any non-empty string is truthy) — we use a real bool parser
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.tools.preprocess import main
        root = str(tmp_path)
        write_istd_layout(root, n_train=2, n_test=1, h=24, w=32)
        main(["--path", root, "--subset", "train",
              "--save-sp", "false", "--save-img", "false"])
        assert not os.path.isdir(os.path.join(root, "train", "sp"))
        assert not os.path.isdir(
            os.path.join(root, "train", "sp_restored_img"))


class TestColorAdjustment:
    def test_recovers_known_affine(self, rng):
        from shadow_removal_istd_tpu.tools.color_adjustment import (
            color_adjustment,
        )
        # shadow image = affine(shadow_free) on non-shadow pixels;
        # the regression must recover the transform
        free = rng.integers(30, 220, (32, 32, 3), np.uint8)
        coef = np.array([1.1, 0.95, 1.05])
        offs = np.array([0.02, -0.01, 0.03])
        shadow = np.clip(free / 255.0 * coef + offs, 0, 1)
        shadow = (shadow * 255).astype(np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[:8, :8] = 255  # small shadow region
        corrected, params = color_adjustment(free, shadow, mask)
        # per-channel slope/intercept ~ (offs, coef)
        got = params.reshape(3, 2)
        np.testing.assert_allclose(got[:, 1], coef, atol=0.02)
        np.testing.assert_allclose(got[:, 0], offs, atol=0.02)
        # corrected non-shadow pixels should match the shadow image
        ns = mask == 0
        diff = np.abs(corrected.astype(int) - shadow.astype(int))[ns]
        assert diff.mean() < 3

    def test_fix_split(self, tmp_path, rng):
        from shadow_removal_istd_tpu.tools.color_adjustment import fix_split
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        base = tmp_path / "train"
        for d in ("train_A", "train_B", "train_C"):
            os.makedirs(base / d)
        for i in range(2):
            img = rng.integers(0, 256, (16, 16, 3), np.uint8)
            imwrite(str(base / "train_A" / f"{i}.png"), img)
            imwrite(str(base / "train_B" / f"{i}.png"),
                    (rng.uniform(size=(16, 16)) > 0.7).astype(np.uint8)
                    * 255)
            imwrite(str(base / "train_C" / f"{i}.png"),
                    rng.integers(0, 256, (16, 16, 3), np.uint8))
        n = fix_split(str(tmp_path), "train")
        assert n == 2
        out = os.listdir(base / "train_C_fixed_official")
        assert len(out) == 2


class TestConvertVGG:
    def test_conversion_layout(self, rng):
        from shadow_removal_istd_tpu.tools.convert_vgg import (
            convert_state_dict,
        )
        # synth a state dict with the torchvision features[:40] naming
        conv_bn = [(0, 1), (3, 4), (7, 8), (10, 11), (14, 15), (17, 18),
                   (20, 21), (23, 24), (27, 28), (30, 31), (33, 34),
                   (36, 37)]
        cfg = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512]
        prev = 3
        sd = {}
        for (ci, bi), ch in zip(conv_bn, cfg):
            sd[f"{ci}.weight"] = rng.normal(size=(ch, prev, 3, 3))
            sd[f"{ci}.bias"] = rng.normal(size=(ch,))
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{bi}.{suffix}"] = rng.normal(size=(ch,))
            prev = ch
        out = convert_state_dict(sd)
        assert out["conv0_kernel"].shape == (3, 3, 3, 64)   # HWIO
        assert out["conv11_kernel"].shape == (3, 3, 512, 512)
        assert out["bn0_mean"].shape == (64,)
        # kernel transpose is consistent: HWIO[:, :, i, o] == OIHW[o, i]
        np.testing.assert_array_equal(
            out["conv0_kernel"][..., 0, 0],
            np.asarray(sd["0.weight"])[0, 0])

    def test_loads_into_flax_vgg(self, tmp_path, rng):
        import jax.numpy as jnp
        from shadow_removal_istd_tpu.models.vgg import (
            VGG19Features,
            load_vgg_variables,
        )
        from shadow_removal_istd_tpu.tools.convert_vgg import (
            convert_state_dict,
        )
        conv_bn = [(0, 1), (3, 4), (7, 8), (10, 11), (14, 15), (17, 18),
                   (20, 21), (23, 24), (27, 28), (30, 31), (33, 34),
                   (36, 37)]
        cfg = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512]
        prev = 3
        sd = {}
        for (ci, bi), ch in zip(conv_bn, cfg):
            sd[f"{ci}.weight"] = rng.normal(size=(ch, prev, 3, 3),
                                            scale=0.05)
            sd[f"{ci}.bias"] = np.zeros(ch)
            sd[f"{bi}.weight"] = np.ones(ch)
            sd[f"{bi}.bias"] = np.zeros(ch)
            sd[f"{bi}.running_mean"] = np.zeros(ch)
            sd[f"{bi}.running_var"] = np.ones(ch)
            prev = ch
        path = str(tmp_path / "vgg.npz")
        np.savez(path, **convert_state_dict(sd))
        variables = load_vgg_variables(path)
        feats = VGG19Features().apply(variables,
                                      jnp.ones((1, 32, 32, 3)))
        assert feats.shape == (1, 2, 2, 512)  # 32 / 2^4, through pool4


    def test_cli_accepts_raw_torchvision_checkpoint(self, tmp_path, rng):
        """The fetch script (scripts/fetch_vgg19_bn.sh) hands the raw
        torchvision download to --state-dict; its keys carry the
        full-model "features." prefix, which the CLI must strip."""
        torch = pytest.importorskip("torch")
        from shadow_removal_istd_tpu.tools import convert_vgg
        conv_bn = [(0, 1), (3, 4), (7, 8), (10, 11), (14, 15), (17, 18),
                   (20, 21), (23, 24), (27, 28), (30, 31), (33, 34),
                   (36, 37)]
        cfg = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512]
        prev = 3
        sd = {}
        for (ci, bi), ch in zip(conv_bn, cfg):
            sd[f"features.{ci}.weight"] = torch.randn(ch, prev, 3, 3)
            sd[f"features.{ci}.bias"] = torch.randn(ch)
            sd[f"features.{bi}.weight"] = torch.ones(ch)
            sd[f"features.{bi}.bias"] = torch.zeros(ch)
            sd[f"features.{bi}.running_mean"] = torch.zeros(ch)
            sd[f"features.{bi}.running_var"] = torch.ones(ch)
            prev = ch
        pth = str(tmp_path / "vgg19_bn-c79401a0.pth")
        torch.save(sd, pth)
        out = str(tmp_path / "vgg19_bn.npz")
        convert_vgg.main(["--state-dict", pth, "--out", out])
        data = np.load(out)
        assert data["conv0_kernel"].shape == (3, 3, 3, 64)
        assert data["bn11_var"].shape == (512,)

    def test_fetch_script_pins_checksum(self):
        """scripts/fetch_vgg19_bn.sh must pin the torchvision URL whose
        filename hash matches its hard-coded sha256 prefix."""
        path = os.path.join(os.path.dirname(__file__), "..",
                            "scripts", "fetch_vgg19_bn.sh")
        text = open(path).read()
        assert "vgg19_bn-c79401a0.pth" in text
        assert 'SHA256_PREFIX="c79401a0"' in text
        assert "sha256sum" in text
        assert os.access(path, os.X_OK)


class TestExperiments:
    def test_grid_expansion(self):
        from shadow_removal_istd_tpu.tools.experiments import expand_grid
        combos = expand_grid({"a": [1, 2], "b": "x", "c": [True, False]})
        assert len(combos) == 4
        assert {"a": 1, "b": "x", "c": True} in combos

    def test_build_commands(self, tmp_path):
        from shadow_removal_istd_tpu.tools.experiments import (
            build_commands,
        )
        spec = {"operations": {"op": {
            "main": "shadow_removal_istd_tpu.cli.main",
            "label": "t_{net-G}",
            "flags": {"tasks": "train", "net-G": ["unet", "mnet"]},
        }}}
        cmds = build_commands(spec, "op", str(tmp_path))
        assert len(cmds) == 2
        run_dir, cmd = cmds[0]
        assert run_dir.endswith("t_unet")
        assert "--net-G" in cmd and "unet" in cmd

    def test_repo_experiments_yaml_parses(self):
        from shadow_removal_istd_tpu.tools.experiments import (
            _load,
            build_commands,
        )
        spec = _load("experiments.yaml")
        for op in ("shadow-removal-train", "STCGAN-train"):
            cmds = build_commands(spec, op)
            assert cmds


class TestLoggingUtils:
    def test_teeio(self, tmp_path):
        import io
        from shadow_removal_istd_tpu.utils.logging_utils import TeeIo
        stream = io.StringIO()
        path = str(tmp_path / "log.txt")
        with TeeIo(path, stream, mode="w") as tee:
            tee.write("hello\n")
            tee.flush()
        assert stream.getvalue() == "hello\n"
        assert open(path).read() == "hello\n"

    def test_tqdm_handler(self, capsys):
        import logging
        from shadow_removal_istd_tpu.utils.logging_utils import (
            TqdmStreamHandler,
        )
        logger = logging.getLogger("tqdm_test")
        logger.handlers = [TqdmStreamHandler()]
        logger.setLevel(logging.INFO)
        logger.info("via tqdm")
        captured = capsys.readouterr()
        assert "via tqdm" in captured.out or "via tqdm" in captured.err


class TestExportTorch:
    def test_checkpoint_to_reference_pt_roundtrip(self, tmp_path):
        """CLI: checkpoint -> reference-format .pt files; loading one
        back through the reference model must reproduce the original
        flax weights exactly."""
        pytest.importorskip("torch")
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference not mounted")
        import jax
        from shadow_removal_istd_tpu.engine import (
            TrainConfig,
            build_models,
            init_state,
        )
        from shadow_removal_istd_tpu.engine.checkpoint import (
            save_checkpoint,
        )
        from shadow_removal_istd_tpu.tools import export_torch
        from shadow_removal_istd_tpu.tools.torch_bridge import (
            load_torch_checkpoint,
        )

        cfg = TrainConfig(ngf=8, ndf=8, image_size=32, batch_size=1,
                          use_visual_loss=False, droprate=0.0)
        models = build_models(cfg)
        state = init_state(jax.random.key(42), cfg, models)
        ckpt = str(tmp_path / "checkpoint.msgpack")
        save_checkpoint(state, ckpt, epoch=0)

        out = str(tmp_path / "torch_w")
        export_torch.main(["--load-checkpoint", ckpt, "--out-dir", out,
                           "--reference-path", "/root/reference",
                           "--ngf", "8", "--ndf", "8",
                           "--suffix", "best"])
        files = sorted(os.listdir(out))
        assert files == ["D1_PatchGAN_best.pt", "D2_PatchGAN_best.pt",
                         "G1_MNet_best.pt", "G2_MNet_best.pt"]

        # reference-side load of G1, bridged back -> identical weights
        rn = export_torch._import_reference("/root/reference")
        tG1 = rn.get_generator("mnet", in_channels=3, out_channels=1,
                               ngf=8, drop_rate=0.0, no_conv_t=False,
                               use_selu=False, activation="tanh")
        x = np.zeros((1, 64, 64, 3), np.float32)
        v = load_torch_checkpoint(os.path.join(out, "G1_MNet_best.pt"),
                                  tG1, models.g1, x)
        import jax as _jax
        for a, b in zip(_jax.tree.leaves(v["params"]),
                        _jax.tree.leaves(state.g_params["g1"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
