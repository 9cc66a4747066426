"""Serving path: bucketed engine, micro-batcher, HTTP daemon.

The reference has no serving component (its inference is the offline
directory loop, src/cgan.py:420-464); these tests cover the beyond-
reference online path end-to-end over a real local HTTP socket.
"""

import http.client
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadow_removal_istd_tpu.serving import (
    InferenceEngine,
    MicroBatcher,
    ServerStats,
    ShadowRemovalServer,
)
from shadow_removal_istd_tpu.utils.image_io import (
    imdecode_color,
    imencode_png,
)

ENGINE_KW = dict(ngf=4, dtype="float32", max_batch=4)


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine("mnet", **ENGINE_KW)


class TestEngine:
    def test_bucket_rounding(self, engine):
        assert engine.bucket_of(40, 56) == (64, 64)
        assert engine.bucket_of(64, 64) == (64, 64)
        assert engine.bucket_of(65, 64) == (96, 64)

    def test_output_shapes_and_crop(self, engine):
        img = _img(40, 56)
        (matte, clean), = engine.infer_group([img])
        assert matte.shape == (40, 56) and matte.dtype == np.uint8
        assert clean.shape == (40, 56, 3) and clean.dtype == np.uint8

    def test_matches_direct_apply(self, engine):
        """The engine's in-graph pipeline == pad + normalize + G1/G2 +
        denormalize + quantize done by hand (within jit-vs-eager conv
        reassociation, i.e. <=1 uint8 level)."""
        img = _img(40, 56, seed=3)
        (matte, clean), = engine.infer_group([img])
        padded = np.full((1, 64, 64, 3), 128, np.uint8)
        padded[0, :40, :56] = img
        x = jnp.asarray(padded, jnp.float32) * (2.0 / 255.0) - 1.0
        m = engine.g1.apply(engine.v1, x)
        y = engine.g2.apply(engine.v2, jnp.concatenate([x, m], axis=-1))
        ref = np.asarray(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255.0
                         ).astype(np.uint8)[0, :40, :56]
        diff = np.abs(clean.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 1

    def test_deterministic(self, engine):
        img = _img(32, 32, seed=5)
        a = engine.infer_group([img])
        b = engine.infer_group([img])
        np.testing.assert_array_equal(a[0][1], b[0][1])

    def test_batch_padding_does_not_leak(self, engine):
        """A 3-image group pads the device batch to 4; each image's
        result must equal its single-dispatch result (batch entries
        are independent in eval mode: no BN batch coupling)."""
        imgs = [_img(32, 32, seed=s) for s in range(3)]
        grouped = engine.infer_group(imgs)
        for img, (gm, gy) in zip(imgs, grouped):
            (sm, sy), = engine.infer_group([img])
            np.testing.assert_array_equal(gm, sm)
            np.testing.assert_array_equal(gy, sy)

    def test_mixed_buckets_rejected(self, engine):
        with pytest.raises(ValueError, match="mixed buckets"):
            engine.infer_group([_img(32, 32), _img(96, 96)])

    def test_weight_roundtrip(self, tmp_path, engine):
        """load_weights restores exactly the trainer's msgpack format
        (engine/checkpoint.py payload = {params, batch_stats})."""
        from flax import serialization

        for name, variables in (("g1", engine.v1), ("g2", engine.v2)):
            payload = {"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})}
            (tmp_path / f"{name}.msgpack").write_bytes(
                serialization.to_bytes(jax.device_get(payload)))
        fresh = InferenceEngine("mnet", seed=7, **ENGINE_KW)
        before = fresh.infer_group([_img(32, 32)])[0][1]
        fresh.load_weights(str(tmp_path / "g1.msgpack"),
                           str(tmp_path / "g2.msgpack"))
        after = fresh.infer_group([_img(32, 32)])[0][1]
        want = engine.infer_group([_img(32, 32)])[0][1]
        assert not np.array_equal(before, want)  # seed 7 != seed 0
        np.testing.assert_array_equal(after, want)

    def test_set_variables_adopts_live_state(self, engine):
        """The --tasks serve path: hand another engine's variable trees
        over in memory (no msgpack) and get its exact outputs."""
        fresh = InferenceEngine("mnet", seed=7, **ENGINE_KW)
        fresh.set_variables(
            {"params": engine.v1["params"],
             "batch_stats": engine.v1.get("batch_stats", {})},
            {"params": engine.v2["params"],
             "batch_stats": engine.v2.get("batch_stats", {})})
        img = _img(32, 32, seed=21)
        np.testing.assert_array_equal(
            fresh.infer_group([img])[0][1],
            engine.infer_group([img])[0][1])

    def test_serve_task_in_cli_surface(self):
        from shadow_removal_istd_tpu.cli.main import build_parser

        args = build_parser().parse_args(
            ["--tasks", "serve", "--load-weights-g1", "a",
             "--load-weights-g2", "b", "--serve-port", "0"])
        assert args.tasks == ["serve"] and args.serve_port == 0
        assert args.serve_window_ms == 5.0
        assert args.serve_max_queue is None  # default 8*max-batch
        assert args.serve_timeout_s == 600.0
        args = build_parser().parse_args(
            ["--tasks", "serve", "--load-weights-g1", "a",
             "--load-weights-g2", "b", "--serve-max-queue", "4",
             "--serve-timeout-s", "30"])
        assert args.serve_max_queue == 4 and args.serve_timeout_s == 30.0

    def test_bf16_engine_runs(self):
        eng = InferenceEngine("mnet", ngf=4, dtype="bfloat16",
                              max_batch=2)
        (matte, clean), = eng.infer_group([_img(32, 32)])
        assert clean.shape == (32, 32, 3)
        # params actually cast (the flagship-bench serving numerics)
        leaf = jax.tree_util.tree_leaves(eng.v1["params"])[0]
        assert leaf.dtype == jnp.bfloat16

    def test_int8_engine_tracks_f32(self):
        """dtype=int8: the PTQ pipeline (fold -> calibrate -> s8 convs,
        models/quant.py) wired into the serving engine. Must produce
        the same uint8 image as the f32 engine up to PTQ noise, with
        real calibration images driving the activation scales."""
        calib = [_img(32, 32, seed=s) for s in range(2)]
        e8 = InferenceEngine("mnet", ngf=4, dtype="int8", max_batch=2,
                             calib_images=calib, seed=3)
        ef = InferenceEngine("mnet", ngf=4, dtype="float32", max_batch=2,
                             seed=3)
        ef.set_variables(e8.v1, e8.v2)  # identical f32 weights
        img = _img(32, 32, seed=9)
        (m8, y8), = e8.infer_group([img])
        (mf, yf), = ef.infer_group([img])
        assert y8.shape == yf.shape == (32, 32, 3)
        err = y8.astype(np.float32) - yf.astype(np.float32)
        rms = float(np.sqrt(np.mean(err ** 2)))
        psnr = 20 * np.log10(255.0 / max(rms, 1e-9))
        assert psnr > 30.0, f"int8 serving too far from f32: {psnr:.1f}dB"

    def test_int8_rejects_unsupported_configs(self):
        with pytest.raises(ValueError, match="int8"):
            InferenceEngine("unet", ngf=4, dtype="int8")
        with pytest.raises(ValueError, match="int8"):
            InferenceEngine("mnet", ngf=4, dtype="int8",
                            nn_upconv=False)


@pytest.mark.slow
class TestServeTaskSubprocess:
    def test_cli_serve_task_end_to_end(self, tmp_path):
        """--tasks serve on the real CLI in a real process: starts,
        answers HTTP on the loaded weights, exits cleanly on SIGTERM
        (the production train-then-serve surface)."""
        import signal
        import socket
        import subprocess
        import sys

        from shadow_removal_istd_tpu.engine import (
            TrainConfig,
            build_models,
            init_state,
        )
        from shadow_removal_istd_tpu.engine.checkpoint import (
            save_model_weights,
        )

        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          steps_per_epoch=1)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        save_model_weights(state, models, str(tmp_path), "best")
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen(
            [sys.executable, "-m", "shadow_removal_istd_tpu.cli.main",
             "--tasks", "serve", "--devices", "cpu", "--ngf", "4",
             "--ndf", "4", "--droprate", "0",
             "--serve-port", str(port),
             "--load-weights-g1",
             str(tmp_path / "G1_MNet_best.msgpack"),
             "--load-weights-g2",
             str(tmp_path / "G2_MNet_best.msgpack"),
             "--logs", str(tmp_path / "logs")],
            env=env, cwd="/root/repo")
        try:
            deadline = time.time() + 120
            up = False
            while time.time() < deadline:
                try:
                    conn = http.client.HTTPConnection(
                        "127.0.0.1", port, timeout=5)
                    conn.request("GET", "/healthz")
                    up = conn.getresponse().status == 200
                    conn.close()
                    if up:
                        break
                except OSError:
                    time.sleep(1.0)
                assert proc.poll() is None, "server process died"
            assert up, "daemon never became healthy"
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=120)
            conn.request("POST", "/v1/unshadow",
                         body=imencode_png(_img(32, 32, seed=50)))
            resp = conn.getresponse()
            png = resp.read()
            conn.close()
            assert resp.status == 200
            assert imdecode_color(png).shape == (32, 32, 3)
            proc.send_signal(signal.SIGTERM)
            assert proc.wait(timeout=30) == 0
        finally:
            if proc.poll() is None:
                proc.kill()


class TestArtifactServing:
    """Serve a StableHLO export artifact — the no-model-code-on-host
    deployment path (tools/export.py -> ArtifactEngine)."""

    @pytest.fixture(scope="class")
    def artifact(self, tmp_path_factory):
        from shadow_removal_istd_tpu.engine import (
            TrainConfig,
            build_models,
            init_state,
        )
        from shadow_removal_istd_tpu.tools.export import (
            export_stacked_inference,
        )

        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          steps_per_epoch=1)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        path = str(tmp_path_factory.mktemp("artifact") / "model.shlo")
        export_stacked_inference(path, state, models,
                                 image_shape=(64, 64),
                                 batch_size=None, platforms=("cpu",))
        return path, models, state

    def test_serves_and_matches_infer_step(self, artifact):
        from shadow_removal_istd_tpu.engine.steps import make_infer_step
        from shadow_removal_istd_tpu.serving import ArtifactEngine

        path, models, state = artifact
        eng = ArtifactEngine(path, max_batch=4)
        assert (eng.height, eng.width) == (64, 64)
        assert eng.fixed_batch is None  # symbolic batch
        img = _img(40, 56, seed=31)
        (matte, clean), = eng.infer_group([img])
        assert matte.shape == (40, 56) and clean.shape == (40, 56, 3)
        # oracle: the engine's own padding + the package infer step
        padded = np.full((1, 64, 64, 3), 128, np.uint8)
        padded[0, :40, :56] = img
        x = jnp.asarray(padded, jnp.float32) * (2.0 / 255.0) - 1.0
        _, y = make_infer_step(models)(state.g_params,
                                       state.batch_stats, x)
        ref = np.asarray(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255.0
                         ).astype(np.uint8)[0, :40, :56]
        diff = np.abs(clean.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 1

    def test_oversize_rejected(self, artifact):
        from shadow_removal_istd_tpu.serving import ArtifactEngine

        eng = ArtifactEngine(artifact[0])
        with pytest.raises(ValueError, match="exceeds the artifact"):
            eng.bucket_of(65, 64)

    def test_http_daemon_over_artifact(self, artifact):
        from shadow_removal_istd_tpu.serving import ArtifactEngine

        eng = ArtifactEngine(artifact[0], max_batch=2)
        srv = ShadowRemovalServer(eng, port=0, window_ms=5.0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            img = _img(64, 64, seed=33)
            status, headers, body = _post(srv, imencode_png(img))
            assert status == 200
            np.testing.assert_array_equal(
                imdecode_color(body), eng.infer_group([img])[0][1])
            # baked artifacts cannot hot-reload weights
            status, _, _ = _post(srv, b"{}", path="/admin/reload")
            assert status == 501
        finally:
            srv.shutdown()


class TestMultiDeviceServing:
    """Data-parallel serving: batch sharded over the 8-device CPU mesh
    (the TPU-native scale-out path), params replicated via GSPMD."""

    def test_matches_single_device(self, engine):
        assert len(jax.devices()) >= 8  # conftest forces 8 virtual
        eng8 = InferenceEngine("mnet", devices=8, **ENGINE_KW)
        imgs = [_img(32, 32, seed=s) for s in range(3)]
        want = engine.infer_group(imgs)
        got = eng8.infer_group(imgs)  # pads batch 3 -> 8 shards of 1
        for (wm, wy), (gm, gy) in zip(want, got):
            # identical params (same seed); GSPMD partitioning may
            # reassociate conv reductions -> allow 1 uint8 level
            assert np.abs(gm.astype(np.int16)
                          - wm.astype(np.int16)).max() <= 1
            assert np.abs(gy.astype(np.int16)
                          - wy.astype(np.int16)).max() <= 1

    def test_batch_padded_to_mesh_multiple(self):
        eng = InferenceEngine("mnet", ngf=4, dtype="float32",
                              max_batch=6, devices=4)
        outs = eng.infer_group([_img(32, 32, seed=s) for s in range(5)])
        assert len(outs) == 5  # 5 -> device batch 8 (pow2 then /4), crop back


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self, engine):
        stats = ServerStats()
        b = MicroBatcher(engine, window_ms=300.0, stats=stats)
        try:
            futs = [b.submit(_img(32, 32, seed=s)) for s in range(4)]
            outs = [f.result(timeout=120) for f in futs]
            assert all(o[1].shape == (32, 32, 3) for o in outs)
            snap = stats.snapshot()
            assert snap["images"] == 4
            assert snap["max_batch"] >= 2  # coalesced within the window
        finally:
            b.close()

    def test_error_resolves_future(self, engine):
        b = MicroBatcher(engine, window_ms=0.0)
        try:
            bad = np.zeros((0, 0, 3), np.uint8)  # empty -> model error
            with pytest.raises(Exception):
                b.submit(bad).result(timeout=120)
            # loop survives: a good request still completes
            good = b.submit(_img(32, 32)).result(timeout=120)
            assert good[1].shape == (32, 32, 3)
        finally:
            b.close()


@pytest.fixture(scope="module")
def server(engine):
    srv = ShadowRemovalServer(engine, port=0, window_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _post(server, body, path="/v1/unshadow", headers=None):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=300)
    try:
        conn.request("POST", path, body=body,
                     headers=headers or {})
        resp = conn.getresponse()
        return resp.status, dict(resp.getheaders()), resp.read()
    finally:
        conn.close()


def _get(server, path):
    host, port = server.address
    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("GET", path)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


class TestHTTP:
    def test_healthz(self, server):
        status, body = _get(server, "/healthz")
        assert status == 200
        info = json.loads(body)
        assert info["status"] == "ok" and "platform" in info

    def test_unshadow_roundtrip(self, server, engine):
        img = _img(40, 56, seed=11)
        status, headers, body = _post(server, imencode_png(img))
        assert status == 200
        assert headers["Content-Type"] == "image/png"
        out = imdecode_color(body)
        # HTTP result == direct engine result on the decoded image
        want = engine.infer_group([img])[0][1]
        np.testing.assert_array_equal(out, want)

    def test_matte_output(self, server, engine):
        img = _img(32, 32, seed=12)
        status, headers, body = _post(
            server, imencode_png(img), path="/v1/unshadow?output=matte")
        assert status == 200
        import cv2
        matte = cv2.imdecode(np.frombuffer(body, np.uint8),
                             cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(
            matte, engine.infer_group([img])[0][0])

    def test_bad_requests(self, server):
        status, _, body = _post(server, b"not an image")
        assert status == 400
        status, _, _ = _post(server, imencode_png(_img(8, 8)),
                             path="/v1/unshadow?output=bogus")
        assert status == 400
        status, _, _ = _post(server, b"", path="/v1/unshadow")
        assert status == 411
        status, _ = _get(server, "/nope")
        assert status == 404

    def test_error_reply_closes_connection(self, server):
        """Errors can be sent before the body is read; keep-alive would
        desync on the unread bytes, so error replies must close."""
        host, port = server.address
        conn = http.client.HTTPConnection(host, port, timeout=60)
        try:
            conn.request("POST", "/v1/unshadow?output=bogus",
                         body=b"x" * 1000)
            resp = conn.getresponse()
            assert resp.status == 400
            assert resp.getheader("Connection") == "close"
            resp.read()
        finally:
            conn.close()

    def test_concurrent_requests_and_stats(self, server):
        imgs = [imencode_png(_img(32, 32, seed=s)) for s in range(4)]
        with ThreadPoolExecutor(max_workers=4) as pool:
            results = list(pool.map(lambda b: _post(server, b), imgs))
        assert all(r[0] == 200 for r in results)
        # decoded outputs for identical inputs must be identical
        a = _post(server, imgs[0])[2]
        b = _post(server, imgs[0])[2]
        assert a == b
        status, body = _get(server, "/stats")
        assert status == 200
        snap = json.loads(body)
        assert snap["requests"] >= 6
        assert snap["batches"] >= 1
        assert "latency_ms" in snap

    REF = "/root/reference/color_adjustment_code"

    @pytest.mark.skipif(not __import__("os").path.isdir(REF),
                        reason="reference sample images not mounted")
    def test_real_image_native_resolution(self, server, engine):
        """The genuine 480x640 ISTD test image round-trips through the
        daemon at native resolution (480/640 divide MNet's 32 -> the
        bucket adds no padding, same as the offline infer path)."""
        from shadow_removal_istd_tpu.utils.image_io import imread_color

        img = imread_color(f"{self.REF}/114-5_shadow.png")
        assert img.shape == (480, 640, 3)
        assert engine.bucket_of(480, 640) == (480, 640)
        status, _, body = _post(server, imencode_png(img))
        assert status == 200
        out = imdecode_color(body)
        assert out.shape == (480, 640, 3)
        np.testing.assert_array_equal(out, engine.infer_group([img])[0][1])

    def test_hot_reload(self, tmp_path, engine):
        """POST /admin/reload swaps weights with zero downtime; the
        mutation runs on the batcher thread, never racing a dispatch."""
        from flax import serialization

        donor = InferenceEngine("mnet", seed=7, **ENGINE_KW)
        for name, variables in (("g1", donor.v1), ("g2", donor.v2)):
            payload = {"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})}
            (tmp_path / f"{name}.msgpack").write_bytes(
                serialization.to_bytes(jax.device_get(payload)))
        own = InferenceEngine("mnet", **ENGINE_KW)  # seed 0
        srv = ShadowRemovalServer(own, port=0, window_ms=0.0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            img = _img(32, 32, seed=41)
            png = imencode_png(img)
            before = _post(srv, png)[2]
            status, _, _ = _post(
                srv, json.dumps({"g1": str(tmp_path / "g1.msgpack"),
                                 "g2": str(tmp_path / "g2.msgpack")}
                                ).encode(), path="/admin/reload")
            assert status == 200
            after = _post(srv, png)[2]
            assert after != before
            np.testing.assert_array_equal(
                imdecode_color(after), donor.infer_group([img])[0][1])
            # bad specs are 400s, not crashes
            assert _post(srv, b"{}", path="/admin/reload")[0] == 400
            assert _post(srv, json.dumps(
                {"g1": "/nope", "g2": "/nope"}).encode(),
                path="/admin/reload")[0] == 400
        finally:
            srv.shutdown()

    def test_payload_cap(self, engine):
        srv = ShadowRemovalServer(engine, port=0, window_ms=0.0,
                                  max_body_mb=0.001)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            deadline = time.time() + 10
            while time.time() < deadline:
                try:
                    status, _, _ = _post(srv, b"x" * 4096)
                    break
                except ConnectionRefusedError:  # pragma: no cover
                    time.sleep(0.1)
            assert status == 413
        finally:
            srv.shutdown()


class _SlowEngine:
    """Deterministic-latency fake engine: saturation tests need a
    service rate the test controls, not whatever the CI host's XLA
    does. Interface = the _EngineCore surface MicroBatcher touches."""

    dtype = "float32"

    def __init__(self, delay_s=0.15, max_batch=2):
        self.delay_s = delay_s
        self.max_batch = max_batch
        self.calls = 0
        self.images_seen = 0

    def bucket_of(self, h, w):
        return (64, 64)

    def infer_group(self, imgs):
        self.calls += 1
        self.images_seen += len(imgs)
        time.sleep(self.delay_s)
        return [(np.zeros(im.shape[:2], np.uint8),
                 np.zeros(im.shape[:2] + (3,), np.uint8))
                for im in imgs]


class TestLoadShedding:
    """Admission control under overload: bounded queue, 503s, and
    queued-past-deadline drops (the reference serves nothing; the bar
    here is production behavior, not parity)."""

    def test_submit_sheds_beyond_max_queue(self):
        from shadow_removal_istd_tpu.serving import OverloadedError
        eng = _SlowEngine(delay_s=0.2, max_batch=1)
        stats = ServerStats()
        b = MicroBatcher(eng, window_ms=0.0, stats=stats, max_queue=3)
        try:
            admitted, shed = [], 0
            for s in range(30):
                try:
                    admitted.append(b.submit(_img(8, 8, seed=s)))
                except OverloadedError:
                    shed += 1
                assert b.depth <= 3  # the invariant under test
            assert shed > 0
            assert stats.snapshot()["shed"] == shed
            for f in admitted:
                f.result(timeout=60)  # every admitted request completes
        finally:
            b.close()

    def test_expired_in_queue_dropped_before_dispatch(self):
        eng = _SlowEngine(delay_s=0.3, max_batch=1)
        stats = ServerStats()
        b = MicroBatcher(eng, window_ms=0.0, stats=stats,
                         max_queue=64, deadline_s=0.1)
        try:
            futs = [b.submit(_img(8, 8, seed=s)) for s in range(5)]
            results = []
            for f in futs:
                try:
                    results.append(f.result(timeout=60))
                except TimeoutError:
                    results.append(None)
            expired = sum(r is None for r in results)
            assert expired >= 2  # 0.3s service vs 0.1s deadline
            assert stats.snapshot()["expired"] == expired
            # dropped requests never reached the device
            assert eng.images_seen == 5 - expired
        finally:
            b.close()

    def test_http_503_with_retry_after_under_burst(self):
        eng = _SlowEngine(delay_s=0.15, max_batch=2)
        srv = ShadowRemovalServer(eng, port=0, window_ms=1.0,
                                  max_queue=3)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            png = imencode_png(_img(32, 32))
            depths = []

            def one(_):
                st, hdr, _body = _post(srv, png)
                return st, hdr

            with ThreadPoolExecutor(max_workers=32) as ex:
                futs = [ex.submit(one, i) for i in range(32)]
                # sample queue depth while the burst is in flight
                for _ in range(10):
                    st, body = _get(srv, "/stats")
                    depths.append(json.loads(body)["queue_depth"])
                    time.sleep(0.05)
                outcomes = [f.result() for f in futs]
            statuses = [st for st, _ in outcomes]
            assert set(statuses) <= {200, 503}
            assert statuses.count(200) >= 1
            assert statuses.count(503) >= 1
            for st, hdr in outcomes:
                if st == 503:
                    assert hdr.get("Retry-After") == "1"
            assert max(depths) <= 3  # bounded under saturation
            st, body = _get(srv, "/stats")
            snap = json.loads(body)
            assert snap["shed"] == statuses.count(503)
            assert snap["max_queue"] == 3
        finally:
            srv.shutdown()
