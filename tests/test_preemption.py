"""Graceful preemption: SIGTERM -> checkpoint at epoch boundary -> resume."""
import os
import signal
import subprocess
import sys
import time

import pytest

from shadow_removal_istd_tpu.utils.preemption import PreemptionGuard


class TestGuard:
    def test_flag_set_on_signal_and_handlers_restored(self):
        old = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as guard:
            assert not guard.requested
            os.kill(os.getpid(), signal.SIGTERM)
            # delivery is synchronous for a self-signal on the main thread
            assert guard.requested
        assert signal.getsignal(signal.SIGTERM) is old

    def test_noop_without_signal(self):
        with PreemptionGuard() as guard:
            pass
        assert not guard.requested


_TRAIN_SCRIPT = r"""
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from shadow_removal_istd_tpu.cli.main import build_parser, main
args = build_parser().parse_args([
    "--tasks", "train", "--data-dir", {data!r}, "--epochs", "1000",
    "--batch-size", "2", "--image-size", "32", "--ngf", "4", "--ndf", "4",
    "--lambda4", "0", "--lambda5", "0", "--workers", "0",
    "--valid-every", "100000", "--save-every", "100000",
    "--weights", {weights!r}, "--logs", {logs!r}, "--infered", {out!r},
])
print("TRAIN_STARTING", flush=True)
main(args)
print("TRAIN_EXITED_CLEANLY", flush=True)
"""


class TestEndToEnd:
    @pytest.mark.slow
    def test_sigterm_checkpoints_and_resumes(self, tmp_path):
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        data = str(tmp_path / "istd")
        write_istd_layout(data, n_train=4, n_test=2, h=32, w=32)
        weights = str(tmp_path / "weights")
        script = _TRAIN_SCRIPT.format(
            repo=repo, data=data, weights=weights,
            logs=str(tmp_path / "logs"), out=str(tmp_path / "out"))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        proc = subprocess.Popen([sys.executable, "-c", script],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True,
                                env=env)
        try:
            # wait until training is live (epochs are fast at this size),
            # then deliver the eviction notice
            t0 = time.time()
            line = ""
            # "start training" logs only after the guard is installed
            while "start training" not in line:
                line = proc.stdout.readline()
                assert line, "trainer died before starting"
                assert time.time() - t0 < 300
            time.sleep(2)
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out[-2000:]
        assert "TRAIN_EXITED_CLEANLY" in out, out[-2000:]
        assert "preemption checkpoint written" in out, out[-2000:]
        # the CLI appends the run-name suffix (reference src/main.py
        # run-dir naming) to --weights
        import glob
        hits = glob.glob(os.path.join(weights + "*", "checkpoint.msgpack"))
        assert hits, os.listdir(os.path.dirname(weights))
        ckpt_path = hits[0]

        # the checkpoint must be resumable
        import jax
        from shadow_removal_istd_tpu.engine import (
            TrainConfig, build_models, init_state)
        from shadow_removal_istd_tpu.engine.checkpoint import (
            load_checkpoint)
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, steps_per_epoch=2)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        state, epoch, _ = load_checkpoint(state, ckpt_path)
        assert epoch >= 0
