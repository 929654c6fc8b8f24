from facodec_tpu.models.quantize import VectorQuantize, ResidualVectorQuantize  # noqa: F401
from facodec_tpu.models.dac import Encoder, Decoder, EncoderBlock, DecoderBlock, ResidualUnit  # noqa: F401
from facodec_tpu.models.wavenet import WN  # noqa: F401
from facodec_tpu.models.style_encoder import StyleEncoder, MultiHeadAttention  # noqa: F401
from facodec_tpu.models.fa_quantizer import FAquantizer, FApredictors, CNNLSTM  # noqa: F401
from facodec_tpu.models.discriminator import Discriminator, MPD, MRD, MSD  # noqa: F401
from facodec_tpu.models.redecoder import Redecoder  # noqa: F401
from facodec_tpu.models.builder import build_model  # noqa: F401
