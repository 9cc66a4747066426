"""Overfit the single real ISTD triplet: the pipeline must learn it.

The reference repo ships one genuine ISTD test image
(color_adjustment_code/114-5_*, used by its MATLAB demo.m). Training
the stacked pair supervised (dummy D) on that single image is an
end-to-end learning check on REAL data: 400 steps must drive the
LAB-RMSE eval protocol far below the raw shadow-vs-GT error.

Measured on TPU v5e (2026-08-17): L1(matte) 0.89 -> 0.0096,
L1(shadow-free) -> 0.024; LAB RMSE(all) vs GT: 13.45 (input) -> 3.03
(prediction) — cf. the ST-CGAN paper's ~7.47 full-test-set figure.

Run: python benchmarks/overfit_real_sample.py
(set ISTD_SAMPLE_DIR to the directory holding 114-5_*.png; defaults
to the mounted reference copy)
"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/srit_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from shadow_removal_istd_tpu.utils.image_io import imread_color, imread_gray
from shadow_removal_istd_tpu.engine import (
    TrainConfig, build_models, init_state)
from shadow_removal_istd_tpu.engine.steps import make_train_step
from shadow_removal_istd_tpu.ops.resize import resize_area
from shadow_removal_istd_tpu.ops.color import bgr_to_rgb, rgb_to_lab
from shadow_removal_istd_tpu.metrics.metrics import region_metrics

R = os.environ.get("ISTD_SAMPLE_DIR",
                   "/root/reference/color_adjustment_code") + "/"
shadow = imread_color(R + "114-5_shadow.png").astype(np.float32)
free = imread_color(R + "114-5_shadow_free_original.png").astype(np.float32)
mask = imread_gray(R + "114-5_shadow_mask.png").astype(np.float32)

def to_crop(img):
    t = resize_area(jnp.asarray(img)[None], (256, 256))[0]
    return t / 127.5 - 1.0

x = to_crop(shadow)[None]
y = to_crop(free)[None]
m = to_crop(mask[..., None])[None]

cfg = TrainConfig(ngf=32, ndf=32, image_size=256, batch_size=1,
                  net_d="dummy",  # supervised ablation: pure L1 objective
                  use_visual_loss=False, droprate=0.0,
                  compute_dtype="bfloat16", lr_g=2e-4)
models = build_models(cfg)
state = init_state(jax.random.key(0), cfg, models)
step = make_train_step(models, cfg)
batch = (x, m, y)
t0 = time.time()
for i in range(400):
    state, metrics = step(state, batch, jax.random.key(i), 1.0, 1.0)
    if i in (0, 50, 100, 200, 399):
        got = jax.device_get(metrics)
        print(f"step {i:3d}: L1matte {float(got['data1']):.4f} "
              f"L1free {float(got['data2']):.4f}", flush=True)
print(f"400 steps in {time.time()-t0:.1f}s", flush=True)

# final: LAB RMSE of the prediction vs ground truth on the real image
from shadow_removal_istd_tpu.engine import make_infer_step
infer = make_infer_step(models)
m_pred, y_pred = infer(state.g_params, state.batch_stats, x)
to_lab = lambda t: rgb_to_lab(bgr_to_rgb(jnp.clip(
    t.astype(jnp.float32) * 0.5 + 0.5, 0, 1)))
shadow_mask = m[..., 0] > 0
parts = jax.device_get(region_metrics(to_lab(y_pred), to_lab(y),
                                      shadow_mask))
rmse_all = float((parts["rmse_sum"] + parts["rmse_non_sum"])
                 / (parts["pixels"] + parts["pixels_non"]))
base = jax.device_get(region_metrics(to_lab(x), to_lab(y), shadow_mask))
base_all = float((base["rmse_sum"] + base["rmse_non_sum"])
                 / (base["pixels"] + base["pixels_non"]))
print(f"LAB RMSE(all): input-vs-GT {base_all:.2f} -> pred-vs-GT "
      f"{rmse_all:.2f}", flush=True)
