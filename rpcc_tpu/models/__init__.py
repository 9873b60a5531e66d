"""Device encoder/decoder graphs and the host compression pipeline."""

from rpcc_tpu.models.encoder import make_encoder, EncoderOutput
from rpcc_tpu.models.decoder import make_decoder
