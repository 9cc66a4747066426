"""Loss zoo: L1 data, adversarial variants, VGG perceptual, SoftAdapt,
BEGAN k-balance (reference: src/loss.py, src/cgan.py:290-360)."""

from shadow_removal_istd_tpu.losses.adversarial import (  # noqa: F401
    AdversarialLoss,
    make_adversarial_loss,
)
from shadow_removal_istd_tpu.losses.began_balance import (  # noqa: F401
    began_d_loss,
    began_k_update,
)
from shadow_removal_istd_tpu.losses.data import l1_loss, l2_loss  # noqa: F401
from shadow_removal_istd_tpu.losses.softadapt import (  # noqa: F401
    SoftAdaptState,
    softadapt_combine,
    softadapt_init,
    softadapt_update,
)
from shadow_removal_istd_tpu.losses.visual import (  # noqa: F401
    sp_visual_loss,
    visual_loss,
)
