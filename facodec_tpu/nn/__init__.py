from facodec_tpu.nn.conv import (  # noqa: F401
    Conv1d,
    Conv2d,
    ConvTranspose1d,
    SConv1d,
    SConvTranspose1d,
)
from facodec_tpu.nn.basic import Linear, Embedding, LayerNorm  # noqa: F401
from facodec_tpu.nn.lstm import LSTM, SLSTM  # noqa: F401
from facodec_tpu.nn.activations import snake, Snake1d, SnakeBeta, mish  # noqa: F401
from facodec_tpu.nn.alias_free import (  # noqa: F401
    Activation1d,
    DownSample1d,
    UpSample1d,
    kaiser_sinc_filter1d,
)
