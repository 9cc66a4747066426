"""Metric tests: reference formulas, independent numpy/scipy oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from shadow_removal_istd_tpu.metrics import (
    lab_mae,
    lab_rmse,
    psnr,
    region_metrics,
    ssim,
)
from shadow_removal_istd_tpu.metrics.metrics import aggregate_regions


class TestLabMetrics:
    def test_rmse_formula(self, rng):
        # reference eval.py:127-129: sum over masked pixels of per-pixel
        # euclidean distance
        a = rng.normal(size=(6, 5, 3)).astype(np.float32)
        b = rng.normal(size=(6, 5, 3)).astype(np.float32)
        mask = rng.integers(0, 2, (6, 5)).astype(bool)
        want = np.sum(np.sqrt(np.sum((a - b) ** 2, axis=-1))[mask])
        got = float(lab_rmse(jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(mask)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_mae_formula(self, rng):
        a = rng.normal(size=(6, 5, 3)).astype(np.float32)
        b = rng.normal(size=(6, 5, 3)).astype(np.float32)
        mask = rng.integers(0, 2, (6, 5)).astype(bool)
        want = np.sum(np.abs(a - b)[mask])
        got = float(lab_mae(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(mask)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_aggregation(self, rng):
        # dataset aggregation = Σerr / Σpixels (eval.py:104-111)
        parts = []
        tot_rmse = tot_px = 0.0
        for i in range(3):
            a = rng.normal(size=(4, 4, 3)).astype(np.float32)
            b = rng.normal(size=(4, 4, 3)).astype(np.float32)
            mask = rng.integers(0, 2, (4, 4)).astype(bool)
            parts.append({k: float(v) for k, v in region_metrics(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)).items()})
            tot_rmse += np.sum(np.sqrt(np.sum((a - b) ** 2, -1))[mask])
            tot_px += mask.sum()
        agg = aggregate_regions(parts)
        assert agg["rmse"] == pytest.approx(tot_rmse / tot_px, rel=1e-5)
        assert set(agg) == {"rmse", "mae", "rmse_non", "mae_non",
                            "rmse_all", "mae_all"}

    def test_identical_is_zero(self, rng):
        a = rng.normal(size=(4, 4, 3)).astype(np.float32)
        mask = np.ones((4, 4), bool)
        assert float(lab_rmse(jnp.asarray(a), jnp.asarray(a),
                              jnp.asarray(mask))) == 0.0


class TestPSNR:
    def test_known_value(self):
        a = np.zeros((8, 8, 3), np.float32)
        b = np.full((8, 8, 3), 0.1, np.float32)
        # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20
        assert float(psnr(jnp.asarray(a), jnp.asarray(b))) == \
            pytest.approx(20.0, abs=1e-3)


class TestSSIM:
    def _oracle(self, a, b, data_range=2.0, win=7):
        """Independent scipy implementation of skimage's uniform-window
        SSIM (the exact algorithm structural_similarity uses)."""
        from scipy.ndimage import uniform_filter
        pad = (win - 1) // 2
        npix = win ** 2
        cov_norm = npix / (npix - 1)
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        vals = []
        for c in range(a.shape[-1]):
            x, y = a[..., c].astype(np.float64), b[..., c].astype(np.float64)
            ux, uy = uniform_filter(x, win), uniform_filter(y, win)
            uxx, uyy = uniform_filter(x * x, win), uniform_filter(y * y, win)
            uxy = uniform_filter(x * y, win)
            vx = cov_norm * (uxx - ux * ux)
            vy = cov_norm * (uyy - uy * uy)
            vxy = cov_norm * (uxy - ux * uy)
            s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
                (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
            vals.append(s[pad:-pad, pad:-pad].mean())
        return float(np.mean(vals))

    def test_matches_scipy_oracle(self, rng):
        a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        want = self._oracle(a, b)
        assert got == pytest.approx(want, abs=1e-4)

    def test_identical_is_one(self, rng):
        a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == \
            pytest.approx(1.0, abs=1e-5)


class TestEvalCLI:
    def test_end_to_end(self, tmp_path, rng):
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        import os
        d1, d2, dm = (tmp_path / n for n in ("pred", "gt", "mask"))
        for d in (d1, d2, dm):
            os.makedirs(d)
        for i in range(3):
            img = rng.integers(0, 256, (24, 32, 3), np.uint8)
            noisy = np.clip(img.astype(int)
                            + rng.integers(-10, 10, img.shape), 0,
                            255).astype(np.uint8)
            mask = (rng.uniform(size=(24, 32)) > 0.5).astype(np.uint8) * 255
            imwrite(str(d1 / f"{i}.png"), img)
            imwrite(str(d2 / f"{i}.png"), noisy)
            imwrite(str(dm / f"{i}.png"), mask)
        res = all_metrics(str(d1), str(d2), size=16, maskdir=str(dm))
        assert set(res) == {"rmse", "mae", "rmse_non", "mae_non",
                            "rmse_all", "mae_all"}
        assert all(np.isfinite(v) and v >= 0 for v in res.values())
        # maskless adds psnr/ssim
        res2 = all_metrics(str(d1), str(d2), size=None)
        assert "psnr" in res2 and "ssim" in res2
        assert 0 < res2["ssim"] <= 1

    def test_logfile_written_and_header_probe(self, tmp_path, rng):
        # --logfile must actually receive the metric lines (the
        # reference's set_logger installs a FileHandler); also pins the
        # PNG header shape probe the batched path uses
        import logging
        import os

        from shadow_removal_istd_tpu.metrics.eval_cli import (
            _image_shape,
            main,
        )
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        d1 = tmp_path / "a"
        os.makedirs(d1)
        img = rng.integers(0, 256, (16, 24, 3), np.uint8)
        imwrite(str(d1 / "x.png"), img)
        assert _image_shape(str(d1 / "x.png")) == (16, 24)
        log = tmp_path / "logs" / "eval.log"
        try:
            main([str(d1), str(d1), "--logfile", str(log)])
        finally:
            # drop the FileHandler so later tests' logging is unaffected
            for h in list(logging.getLogger().handlers):
                logging.getLogger().removeHandler(h)
        text = log.read_text()
        assert "rmse_all" in text

    def test_mask_at_different_resolution_runs(self, tmp_path, rng):
        # mask stored at 2x the image resolution: the anti-aliased
        # downscale + binarization must yield a real mask partition
        # (pred != gt so the region metrics actually depend on it; the
        # exact AA math is pinned by the eval-protocol oracle tests)
        import os

        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        d1, d2, dm = (tmp_path / n for n in ("pred", "gt", "mask"))
        for d in (d1, d2, dm):
            os.makedirs(d)
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        noisy = np.clip(img.astype(int)
                        + rng.integers(-30, 30, img.shape),
                        0, 255).astype(np.uint8)
        # half-shadow mask so both regions are populated after resize
        mask = np.zeros((32, 32), np.uint8)
        mask[:16] = 255
        imwrite(str(d1 / "x.png"), img)
        imwrite(str(d2 / "x.png"), noisy)
        imwrite(str(dm / "x.png"), mask)
        res = all_metrics(str(d1), str(d2), size=None, maskdir=str(dm))
        assert res["rmse"] > 0 and res["rmse_non"] > 0
        assert np.isfinite(res["rmse_all"])

    def test_identical_dirs_zero_error(self, tmp_path, rng):
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        import os
        d1 = tmp_path / "a"
        os.makedirs(d1)
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        imwrite(str(d1 / "x.png"), img)
        res = all_metrics(str(d1), str(d1), size=None,
                          maskdir=None)
        assert res["rmse_all"] == pytest.approx(0.0, abs=1e-4)


class TestBatchedEval:
    def test_batched_equals_per_image(self, tmp_path, rng):
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        import os
        d1, d2, dm = (tmp_path / n for n in ("pred", "gt", "mask"))
        for d in (d1, d2, dm):
            os.makedirs(d)
        for i in range(5):
            img = rng.integers(0, 256, (24, 32, 3), np.uint8)
            noisy = np.clip(img.astype(int)
                            + rng.integers(-20, 20, img.shape), 0,
                            255).astype(np.uint8)
            mask = (rng.uniform(size=(24, 32)) > 0.5).astype(np.uint8) * 255
            imwrite(str(d1 / f"{i}.png"), img)
            imwrite(str(d2 / f"{i}.png"), noisy)
            imwrite(str(dm / f"{i}.png"), mask)
        batched = all_metrics(str(d1), str(d2), size=None,
                              maskdir=str(dm), batch_size=2)
        per_img = all_metrics(str(d1), str(d2), size=None,
                              maskdir=str(dm), batch_size=1)
        for k in per_img:
            assert batched[k] == pytest.approx(per_img[k], rel=1e-4), k
