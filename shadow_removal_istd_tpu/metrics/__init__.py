"""Evaluation metrics: LAB-space RMSE/MAE over shadow / non-shadow / all
regions, PSNR, SSIM — the ISTD protocol (reference: src/eval.py)."""

from shadow_removal_istd_tpu.metrics.metrics import (  # noqa: F401
    lab_mae,
    lab_rmse,
    psnr,
    ssim,
    region_metrics,
)
