"""Host-side bitstream framing and entropy coding."""

from rpcc_tpu.codec.entropy import BasicCompressor
from rpcc_tpu.codec.bitstream import (
    save_compressed_bitstream,
    read_compressed_bitstream,
    FIELD_ORDER,
)
