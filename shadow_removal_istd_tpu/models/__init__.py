"""Generator and discriminator zoo (flax.linen, NHWC).

Same registry keys as the reference (src/networks.py:33-46):
generators {unet, mnet, denseunet, stcgan}; discriminators
{patchgan, began, stcgan, dummy}.
"""

from shadow_removal_istd_tpu.models.began import BEGAN  # noqa: F401
from shadow_removal_istd_tpu.models.denseunet import DenseUNet  # noqa: F401
from shadow_removal_istd_tpu.models.dummy import DummyNet  # noqa: F401
from shadow_removal_istd_tpu.models.mnet import MNet  # noqa: F401
from shadow_removal_istd_tpu.models.patchgan import PatchGAN  # noqa: F401
from shadow_removal_istd_tpu.models.pix2pix import (  # noqa: F401
    NLayerDiscriminator,
    Pix2PixUNet,
)
from shadow_removal_istd_tpu.models.registry import (  # noqa: F401
    DISCRIMINATORS,
    GENERATORS,
    get_discriminator,
    get_generator,
)
from shadow_removal_istd_tpu.models.unet import UNet  # noqa: F401
from shadow_removal_istd_tpu.models.vgg import (  # noqa: F401
    VGG19Features,
    imagenet_normalize,
    init_vgg_variables,
    load_vgg_variables,
)
