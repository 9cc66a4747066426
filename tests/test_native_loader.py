"""Native C++ PNG decoder tests (bit-parity with cv2, dataset wiring)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from shadow_removal_istd_tpu.data import native_loader as nl  # noqa: E402


@pytest.fixture(scope="module")
def built():
    if not nl.is_available():
        pytest.skip("native loader could not be built (no g++/zlib)")
    return True


class TestNativeDecoder:
    def test_color_matches_cv2(self, built, tmp_path, rng):
        paths = []
        for i in range(5):
            img = rng.integers(0, 256, (40, 56, 3), np.uint8)
            p = str(tmp_path / f"{i}.png")
            cv2.imwrite(p, img)
            paths.append(p)
        ours = nl.decode_batch(paths)
        ref = np.stack([cv2.imread(p, cv2.IMREAD_COLOR) for p in paths])
        np.testing.assert_array_equal(ours, ref)

    def test_gray_matches_cv2(self, built, tmp_path, rng):
        paths = []
        for i in range(3):
            img = rng.integers(0, 256, (32, 24), np.uint8)
            p = str(tmp_path / f"g{i}.png")
            cv2.imwrite(p, img)
            paths.append(p)
        ours = nl.decode_batch(paths, gray=True)
        ref = np.stack([cv2.imread(p, cv2.IMREAD_GRAYSCALE)[..., None]
                        for p in paths])
        np.testing.assert_array_equal(ours, ref)

    def test_gray_from_rgb_refused_and_falls_back(self, built, tmp_path,
                                                  rng):
        # cv2's PNG rgb->gray goes through libpng's error-diffused
        # converter — not reproducible by a per-pixel formula — so the
        # native decoder refuses and ISTDDataset.load_all silently uses
        # cv2 for that stream (bit-identical results either way)
        from shadow_removal_istd_tpu.data.istd import ISTDDataset
        root = tmp_path / "ds" / "test"
        mdir = root / "test_B"
        mdir.mkdir(parents=True)
        for i in range(2):
            rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
            cv2.imwrite(str(mdir / f"{i}.png"), rgb)
        with pytest.raises(IOError):
            nl.decode_batch([str(mdir / "0.png")], gray=True)
        ds = ISTDDataset(str(tmp_path / "ds"), "test", datas=("mask",))
        got = ds.load_all(native=True)["mask"]
        ref = np.stack([cv2.imread(str(mdir / f"{i}.png"),
                                   cv2.IMREAD_GRAYSCALE)[..., None]
                        for i in range(2)])
        np.testing.assert_array_equal(got, ref)

    def test_probe(self, built, tmp_path, rng):
        p = str(tmp_path / "x.png")
        cv2.imwrite(p, rng.integers(0, 256, (17, 23, 3), np.uint8))
        assert nl.probe(p) == (17, 23, 3)

    def test_missing_file_reports_failure(self, built, tmp_path, rng):
        good = str(tmp_path / "ok.png")
        cv2.imwrite(good, rng.integers(0, 256, (8, 8, 3), np.uint8))
        with pytest.raises(IOError):
            nl.decode_batch([good, str(tmp_path / "missing.png")])

    def test_corrupt_file_reports_failure(self, built, tmp_path):
        bad = str(tmp_path / "bad.png")
        with open(bad, "wb") as f:
            f.write(b"not a png at all")
        with pytest.raises(IOError):
            nl.decode_batch([bad])

    def test_dataset_load_all_uses_native(self, built, tmp_path):
        from shadow_removal_istd_tpu.data import ISTDDataset
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        write_istd_layout(str(tmp_path), n_train=3, n_test=1, h=24, w=32)
        ds = ISTDDataset(str(tmp_path), "train",
                         datas=("img", "matte", "target"))
        fast = ds.load_all(native=True)
        slow = ds.load_all(native=False)
        for k in fast:
            np.testing.assert_array_equal(fast[k], slow[k])
