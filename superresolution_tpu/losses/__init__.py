from superresolution_tpu.losses.basic import (  # noqa: F401
    l1_loss,
    l2_loss,
    charbonnier_loss,
    star_weighted_l1,
    astro_loss,
)
from superresolution_tpu.losses.gan import (  # noqa: F401
    relativistic_gan_d_loss,
    relativistic_gan_g_loss,
)
from superresolution_tpu.losses.perceptual import VGG19Features, perceptual_loss  # noqa: F401
from superresolution_tpu.losses.combined import CombinedLoss  # noqa: F401
