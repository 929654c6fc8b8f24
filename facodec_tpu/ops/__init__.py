from facodec_tpu.ops.padding import (  # noqa: F401
    get_extra_padding_for_conv1d,
    pad1d,
    unpad1d,
)
from facodec_tpu.ops.gradrev import gradient_reversal  # noqa: F401
from facodec_tpu.ops.spectral import (  # noqa: F401
    hann_window,
    mel_filterbank,
    stft,
    mel_spectrogram,
    log_mel_spectrogram,
)
from facodec_tpu.ops.vq_math import l2_normalize, nearest_code  # noqa: F401
