"""Real-data checks on the genuine ISTD test image the reference ships.

The reference repo includes one real triplet from the ISTD testing set
(color_adjustment_code/114-5_{shadow,shadow_free_original,shadow_mask}
.png, per its demo.m) — the only actual dataset imagery available in
this environment. These tests run the offline tools on it. (The
repo's corrected.jpg/original.jpg are MATLAB *figure montages*, not
pixel oracles, so the color-adjustment assertion is the tool's own
success criterion: corrected non-shadow pixels must agree with the
shadow image.)
"""
import os

import numpy as np
import pytest

REF = "/root/reference/color_adjustment_code"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference sample images not mounted")


def _triplet():
    from shadow_removal_istd_tpu.utils.image_io import (
        imread_color, imread_gray)
    shadow = imread_color(os.path.join(REF, "114-5_shadow.png"))
    free = imread_color(
        os.path.join(REF, "114-5_shadow_free_original.png"))
    mask = imread_gray(os.path.join(REF, "114-5_shadow_mask.png"))
    return shadow, free, mask


class TestRealSample:
    def test_color_adjustment_fixes_nonshadow_region(self):
        """The MATLAB-replacement must do its job on the real image:
        non-shadow pixels of the corrected shadow-free image agree with
        the shadow image (reference color_adjustment.m:9-27 purpose)."""
        from shadow_removal_istd_tpu.tools.color_adjustment import (
            color_adjustment)
        shadow, free, mask = _triplet()
        corrected, params = color_adjustment(free, shadow, mask)
        ns = mask == 0
        before = np.abs(free.astype(float) - shadow.astype(float))[ns]
        after = np.abs(corrected.astype(float) - shadow.astype(float))[ns]
        # measured on this image: 38.37 -> 5.23 mean gray levels
        assert before.mean() > 30.0         # raw ISTD color shift is large
        assert after.mean() < 7.0           # correction removes it
        # gains ~1.01, offsets ~0.13-0.15 in [0,1] space: the ISTD shift
        # is mostly a brightness offset, slopes stay near identity
        slopes, offsets = params[1::2], params[0::2]
        assert np.all(np.abs(slopes - 1.0) < 0.1)
        assert np.all((offsets > 0.05) & (offsets < 0.3))

    def test_eval_protocol_on_real_pair(self, tmp_path):
        """LAB-RMSE protocol smoke on the real pair: identical images
        give 0; shadow-vs-shadow-free gives a large shadow-region RMSE
        and a (post-correction) small non-shadow RMSE."""
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        from shadow_removal_istd_tpu.tools.color_adjustment import (
            color_adjustment)
        from shadow_removal_istd_tpu.utils.image_io import imwrite
        shadow, free, mask = _triplet()
        corrected, _ = color_adjustment(free, shadow, mask)
        for name, img in (("a/114-5.png", shadow),
                          ("b/114-5.png", corrected),
                          ("m/114-5.png", mask)):
            p = tmp_path / name
            p.parent.mkdir(exist_ok=True)
            imwrite(str(p), img)
        same = all_metrics(str(tmp_path / "a"), str(tmp_path / "a"),
                           maskdir=str(tmp_path / "m"))
        assert same["rmse"] < 1e-6 and same["rmse_non"] < 1e-6
        cross = all_metrics(str(tmp_path / "a"), str(tmp_path / "b"),
                            maskdir=str(tmp_path / "m"))
        # shadow region differs strongly; corrected non-shadow is close
        assert cross["rmse"] > 4 * cross["rmse_non"]
        assert cross["rmse_all"] > 0

    def test_sp_roundtrip_on_real_pair(self):
        """sp = shadowless/shadowed restores the shadow-free image when
        applied back (reference src/utils.py:45-57 semantics)."""
        from shadow_removal_istd_tpu.tools.preprocess import (
            apply_sp, compute_sp)
        shadow, free, mask = _triplet()
        sp = compute_sp(shadow, free)
        restored = apply_sp(shadow, sp)
        err = np.abs(restored.astype(float) - free.astype(float))
        # exact up to uint8 rounding wherever shadowed>0 (zeros clamp)
        nz = shadow.astype(float) > 0
        assert err[nz].mean() < 1.0

    def test_polyfit_sp_roundtrip_on_real_pair(self):
        """The dormant-variant polyfit sp (reference
        src/utils.py:17-44) on the real triplet: a local weighted
        linear fit can't be pixel-exact like the ratio sp, but its
        restored image must approximate the shadow-free target far
        better than the raw shadow image does."""
        from shadow_removal_istd_tpu.tools.preprocess import (
            apply_sp_poly, compute_sp_polyfit)
        shadow, free, mask = _triplet()
        sp = compute_sp_polyfit(shadow, free, ksize=5, deg=1)
        assert sp.shape == shadow.shape[:2] + (3, 2)
        restored = apply_sp_poly(shadow, sp)
        err = np.abs(restored.astype(float) - free.astype(float)).mean()
        base = np.abs(shadow.astype(float) - free.astype(float)).mean()
        assert err < base * 0.25
        assert err < 5.0  # measured on 114-5: ~1-3 gray levels
