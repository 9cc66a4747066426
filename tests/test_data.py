"""Data layer tests: ISTD directory reader, pipeline, device cache, h5."""
import os

import numpy as np
import pytest

import jax

from shadow_removal_istd_tpu.data import (
    BatchPipeline,
    DeviceDatasetCache,
    ISTDDataset,
    synthetic_triplets,
    write_istd_layout,
)


@pytest.fixture(scope="module")
def istd_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("istd"))
    write_istd_layout(root, n_train=4, n_test=2, h=48, w=64)
    return root


class TestISTDDataset:
    def test_layout_and_alignment(self, istd_root):
        ds = ISTDDataset(istd_root, "train",
                         datas=("img", "target", "matte"))
        assert len(ds) == 4
        name, *arrays = ds[0]
        # sorted stream order: img, matte, target
        assert ds.streams == ("img", "matte", "target")
        assert arrays[0].shape == (48, 64, 3)   # img BGR
        assert arrays[1].shape == (48, 64, 1)   # matte gray
        assert arrays[2].shape == (48, 64, 3)   # target
        assert all(a.dtype == np.uint8 for a in arrays)

    def test_load_all_stacks(self, istd_root):
        ds = ISTDDataset(istd_root, "test", datas=("img", "mask"))
        data = ds.load_all()
        assert data["img"].shape == (2, 48, 64, 3)
        assert data["mask"].shape == (2, 48, 64, 1)

    def test_preload_equals_lazy(self, istd_root):
        lazy = ISTDDataset(istd_root, "train", datas=("img",))
        pre = ISTDDataset(istd_root, "train", datas=("img",), preload=True)
        np.testing.assert_array_equal(lazy[1][1], pre[1][1])

    def test_name_prefix(self, istd_root):
        ds = ISTDDataset(istd_root, "test", datas=("img",), name="ISTD")
        assert ds.filename(0).startswith("ISTD" + os.sep)

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ISTDDataset(str(tmp_path), "train", datas=("img",))


class TestBatchPipeline:
    def test_epoch_batches(self):
        data = synthetic_triplets(6, 32, 32)
        pipe = BatchPipeline({k: data[k] for k in ("img", "matte", "target")},
                             batch_size=4, shuffle=True, drop_last=True)
        batches = list(pipe.epoch())
        assert len(batches) == len(pipe) == 1
        assert batches[0][0].shape == (4, 32, 32, 3)

    def test_no_drop_last(self):
        data = synthetic_triplets(6, 16, 16)
        pipe = BatchPipeline({"img": data["img"]}, batch_size=4,
                             shuffle=False, drop_last=False)
        batches = list(pipe.epoch())
        assert [b[0].shape[0] for b in batches] == [4, 2]

    def test_shuffle_covers_all(self):
        data = {"img": np.arange(8, dtype=np.uint8).reshape(8, 1, 1, 1)}
        pipe = BatchPipeline(data, batch_size=8, shuffle=True)
        (batch,) = list(pipe.epoch())
        assert sorted(batch[0].ravel().tolist()) == list(range(8))

    def test_epoch_shuffle_is_resume_deterministic(self):
        """epoch(e) order depends only on (seed, e) — a pipeline that
        skipped epochs 0..e-1 (resume) must produce the same order as
        one that iterated them."""
        data = {"img": np.arange(16, dtype=np.uint8).reshape(16, 1, 1, 1)}
        a = BatchPipeline(data, batch_size=4, shuffle=True, seed=7)
        b = BatchPipeline(data, batch_size=4, shuffle=True, seed=7)
        for e in range(3):
            order_a = [x[0].ravel().tolist() for x in a.epoch(e)]
        order_b = [x[0].ravel().tolist() for x in b.epoch(2)]
        assert order_a == order_b
        # distinct epochs reshuffle
        assert order_b != [x[0].ravel().tolist() for x in b.epoch(1)]
        # and a different seed gives a different stream
        c = BatchPipeline(data, batch_size=4, shuffle=True, seed=8)
        assert order_b != [x[0].ravel().tolist() for x in c.epoch(2)]


class TestDeviceCache:
    def test_gather_roundtrip(self):
        data = synthetic_triplets(6, 16, 16)
        cache = DeviceDatasetCache(
            {k: data[k] for k in ("img", "matte", "target")})
        idx = cache.epoch_indices(jax.random.key(0), batch_size=3)
        assert idx.shape == (2, 3)
        batch = cache.gather(idx[0])
        assert batch[0].shape == (3, 16, 16, 3)
        # gathered rows match the host arrays
        got = np.asarray(batch[0])
        want = data["img"][np.asarray(idx[0])]
        np.testing.assert_array_equal(got, want)


class TestH5:
    def test_build_and_read(self, istd_root, tmp_path):
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset, build_h5
        path = str(tmp_path / "istd.h5")
        build_h5(path, istd_root, subsets=("train", "test"))
        ds = ISTDH5Dataset(path, "train")
        assert len(ds) == 4
        name, img, target, sp = ds[0]
        assert img.shape == (48, 64, 3) and img.dtype == np.float32
        assert sp.shape == (48, 64, 3)
        # normalization applied: values not in [0,1] anymore
        assert img.min() < 0

    def test_build_uses_precomputed_sp(self, tmp_path):
        # sp_dir must pick up tools/preprocess.py's actual output
        # layout <root>/<subset>/sp/<stem>.npy (it used to look one
        # path component off and silently recompute)
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from shadow_removal_istd_tpu.data.h5 import build_h5
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.tools.preprocess import (
            process_split,
        )
        root = str(tmp_path / "istd")
        write_istd_layout(root, n_train=2, n_test=1, h=24, w=32)
        process_split(root, "train", save_sp=True, save_img=False)
        sp_dir = os.path.join(root, "train", "sp")
        sentinel_file = os.path.join(sp_dir, sorted(os.listdir(sp_dir))[0])
        np.save(sentinel_file.removesuffix(".npy"),
                np.full((24, 32, 3), 7.5, np.float32))
        path = str(tmp_path / "istd.h5")
        build_h5(path, root, subsets=("train",), sp_dir=root)
        with h5py.File(path, "r") as f:
            sp0 = f["train"]["sp"][0]
        np.testing.assert_array_equal(sp0, 7.5)

    def test_filename_without_img_stream(self, istd_root):
        # mask-only datasets support item access: filename() must not
        # hard-index the "img" stream
        ds = ISTDDataset(istd_root, "test", datas=("mask",))
        name, mask = ds[0]
        assert name and mask.shape[:2] == (48, 64)

    def test_load_streams_roundtrips_directory_data(self, istd_root,
                                                    tmp_path):
        """Trainer-format uint8 streams from the H5 file match the
        directory loader exactly (img/target via the /255 inverse,
        matte/mask via the extension datasets)."""
        pytest.importorskip("h5py")
        from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset, build_h5
        path = str(tmp_path / "istd.h5")
        build_h5(path, istd_root)
        for datas in (("img", "matte", "target"),
                      ("img", "mask", "target")):
            want = ISTDDataset(istd_root, "train", datas=datas).load_all()
            got = ISTDH5Dataset(path, "train").load_streams(datas)
            assert set(got) == set(datas)
            for k in datas:
                assert got[k].dtype == np.uint8
                np.testing.assert_array_equal(got[k], want[k])

    def test_load_streams_missing_matte_raises(self, tmp_path):
        pytest.importorskip("h5py")
        import h5py as _h5py
        from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset
        # reference-layout-only file (no matte extension dataset)
        path = str(tmp_path / "ref_only.h5")
        with _h5py.File(path, "w") as f:
            g = f.create_group("train")
            g.create_dataset("input_img", data=np.zeros((1, 8, 8, 3),
                                                        np.float32))
            g.create_dataset("target_img", data=np.zeros((1, 8, 8, 3),
                                                         np.float32))
            g.create_dataset("sp", data=np.zeros((1, 8, 8, 3), np.float32))
            g.create_dataset("filename", data=np.array(["a"], dtype="S8"))
        with pytest.raises(KeyError, match="matte"):
            ISTDH5Dataset(path, "train").load_streams(
                ("img", "matte", "target"))

    def test_trainer_trains_from_h5(self, tmp_path):
        """--data-h5 end to end: H5 load -> device cache -> fused epoch
        (BASELINE config 4 wiring)."""
        pytest.importorskip("h5py")
        from shadow_removal_istd_tpu.data.h5 import build_h5
        from shadow_removal_istd_tpu.engine import (
            RunConfig,
            TrainConfig,
            Trainer,
        )
        # 64x64: validation runs at native size, which needs /32 for the
        # depth-5 MNet stack (as in the reference, 480x640 = 15*32 x 20*32)
        root = str(tmp_path / "istd64")
        write_istd_layout(root, n_train=4, n_test=2, h=64, w=64)
        path = str(tmp_path / "istd.h5")
        build_h5(path, root)
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          droprate=0.0, use_visual_loss=False,
                          lambda4=0.0, lambda5=0.0)
        run = RunConfig(data_h5=path,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"),
                        checkpoint_path=str(tmp_path / "ckpt.msgpack"),
                        log_every=1, valid_every=1, vis_every=10,
                        save_every=10, device_cache=True)
        tr = Trainer(cfg, run)
        assert len(tr.train_pipe) == 2  # 4 samples / batch 2
        assert tr.valid_names  # filenames came from the H5 file
        tr.train(1)


class TestImageIOUtils:
    def test_normalize_percentile_matches_reference_math(self):
        """reference normalize_ndarray (src/utils.py:70-74): stretch
        [p3, p97] to [0, 255] uint8 with clipping."""
        from shadow_removal_istd_tpu.utils.image_io import (
            normalize_percentile,
        )
        rng = np.random.default_rng(5)
        a = rng.normal(size=(40, 30)).astype(np.float32)
        got = normalize_percentile(a)
        lo, hi = np.percentile(a, 3), np.percentile(a, 97)
        want = (np.clip((a - lo) / (hi - lo), 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(got, want)
        # constant input: the reference divides by zero here; we clamp
        flat = normalize_percentile(np.full((4, 4), 2.5))
        assert flat.dtype == np.uint8 and np.isfinite(flat).all()
