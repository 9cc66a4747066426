"""shadow_removal_istd_tpu — TPU-native ST-CGAN shadow removal framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nhchiu/Shadow-Removal-ISTD (PyTorch ST-CGAN on the ISTD dataset):

- ``ops``      — image compute kernels (resize-as-matmul, affine warp,
                 color conversion, fused augmentation) designed for the
                 TPU MXU/VPU, not translated from OpenCV.
- ``models``   — the generator zoo (UNet / MNet / DenseUNet / pix2pix UNet)
                 and discriminator zoo (PatchGAN / BEGAN / NLayer / Dummy)
                 as flax.linen modules in NHWC layout.
- ``losses``   — L1 data loss, adversarial losses ({standard, least-squares}
                 x {normal, relativistic, relativistic-average}), VGG-19-BN
                 perceptual loss, SoftAdapt, BEGAN k-balance.
- ``engine``   — a single jitted adversarial train step (D then G update),
                 epoch loops, checkpointing (orbax), inference.
- ``parallel`` — device mesh construction, GSPMD shardings, host->device
                 double-buffered prefetch.
- ``data``     — ISTD directory / HDF5 readers, device-resident dataset
                 cache, synthetic data.
- ``metrics``  — LAB-space RMSE/MAE (shadow / non-shadow / all), PSNR/SSIM,
                 standalone eval CLI matching the reference protocol
                 (reference: src/eval.py).
- ``tools``    — shadow-parameter preprocessing, color adjustment
                 (replaces the reference's MATLAB), VGG weight conversion.
- ``cli``      — argparse front-end preserving the reference's public flag
                 surface (reference: src/main.py:132-329).
"""

__version__ = "0.1.0"
