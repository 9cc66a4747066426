"""Training configuration.

A frozen dataclass carrying what the reference spreads across 40+ argparse
flags (reference: src/main.py:132-329). The CLI layer maps flags onto
this; the engine treats it as static (baked into the jitted step).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TrainConfig:
    # models (reference defaults: src/main.py:173-192)
    net_g: str = "mnet"
    net_d: str = "patchgan"
    ngf: int = 64
    ndf: int = 64
    droprate: float = 0.05
    nn_upconv: bool = False     # --NN-upconv
    use_selu: bool = False      # --SELU
    activation: str = "tanh"

    # optimization (src/main.py:194-215)
    lr_g: float = 5e-4
    lr_d: float = 1e-4
    decay: float = 0.003        # per-epoch exponential decay, gamma=1-decay
    beta1: float = 0.5
    beta2: float = 0.999
    adam_eps: float = 1e-8      # torch Adam default

    # loss weights (src/main.py:216-236); lambda1..5 as there
    lambda1: float = 5.0        # data2 (shadow-free L1)
    lambda2: float = 0.5        # adversarial G1/D1
    lambda3: float = 0.5        # adversarial G2/D2
    lambda4: float = 5.0        # visual matte
    lambda5: float = 50.0       # visual shadow-free

    # adversarial flavour (src/main.py:263-272)
    d_loss_fn: str = "standard"   # {standard, leastsquare}
    d_type: str = "normal"        # {normal, rel, rel_avg}
    loss_mode: str = "reference"  # reference-exact vs corrected semantics
    softadapt: bool = False

    # data/augmentation (src/main.py:152-171)
    image_size: int = 256
    batch_size: int = 16
    aug_scale: float = 0.05
    aug_angle: float = 15.0
    # "gather" = exact cv2-parity warp; "shear" = Pallas 3-shear fast
    # path (~7x faster, differs on a ~1px border ring)
    aug_method: str = "gather"

    # legacy-tree options (reference STCGAN/stcgan.py)
    lr_schedule: str = "exponential"   # or "plateau" (ReduceLROnPlateau)
    aug_resize: tuple | None = None    # train resize before aug, (h, w)
    valid_resize: tuple | None = None  # validation resize, (h, w)
    infer_resize: tuple | None = None  # inference output resize, (h, w)
    dcgan_init: bool = False           # DCGAN N(0,.02) weight init
    dcgan_bn_compat: bool = False      # reproduce the reference's BN
    # scale ~ N(0,.02) (src/networks.py:22-25 as written)
    train_datas: tuple = ("img", "target", "matte")  # stream selection

    # runtime
    remat: bool = False  # jax.checkpoint the train-step phases: trade
    # ~one extra forward per phase for not storing activations across
    # the backward — unlocks larger/full-resolution training batches
    # (HBM is the binding resource; see README perf notes)
    steps_per_epoch: int = 1      # for the per-epoch lr decay schedule
    use_visual_loss: bool = True  # needs VGG variables
    compute_dtype: str = "float32"  # "bfloat16" = mixed precision:
    # bf16 activations/matmuls, f32 params/BatchNorm/losses/optimizer

    def __post_init__(self):
        if self.net_d == "dummy":
            # reference zeroes the adversarial terms for the dummy D
            # (src/cgan.py:160-162)
            object.__setattr__(self, "lambda2", 0.0)
            object.__setattr__(self, "lambda3", 0.0)

    @property
    def began(self) -> bool:
        return self.net_d == "began"
