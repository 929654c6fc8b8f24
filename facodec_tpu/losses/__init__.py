from facodec_tpu.losses.spectral import (  # noqa: F401
    l1_loss,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
    sisdr_loss,
)
from facodec_tpu.losses.gan import (  # noqa: F401
    discriminator_loss,
    generator_adv_losses,
)
from facodec_tpu.losses.supervision import (  # noqa: F401
    cross_entropy,
    focal_loss,
    log_norm,
    smooth_l1_loss,
)
