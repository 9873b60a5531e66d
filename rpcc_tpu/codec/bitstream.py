""".rpcc bitstream framing — byte-compatible with the reference.

Format (``utils/compress_utils.py:167-196``): the entropy-coded fields are
concatenated, each prefixed with a 4-byte native-order ``struct.pack('i')``
length.  Field order: ``salience_level`` (non-uniform mode only),
``contour_map``, ``idx_sequence``, ``plane_param``, ``residual_quantized``.
The stream does not self-describe (no header with accuracy/mode/LiDAR) —
encoder and decoder must be configured identically, like the reference
(README.md:138-140).
"""

from __future__ import annotations

import struct
from typing import Dict

FIELD_ORDER = ("salience_level", "contour_map", "idx_sequence", "plane_param", "residual_quantized")


def save_compressed_bitstream(file: str, compressed_data: Dict[str, bytes], uniform: bool = True) -> None:
    with open(file, "wb") as f:
        f.write(pack_bitstream(compressed_data, uniform))


def pack_bitstream(compressed_data: Dict[str, bytes], uniform: bool = True) -> bytes:
    parts = []
    fields = FIELD_ORDER if not uniform else FIELD_ORDER[1:]
    for name in fields:
        blob = compressed_data[name]
        parts.append(struct.pack("i", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def read_compressed_bitstream(file: str, uniform: bool = True) -> Dict[str, bytes]:
    with open(file, "rb") as f:
        return unpack_bitstream(f.read(), uniform)


def unpack_bitstream(buf: bytes, uniform: bool = True) -> Dict[str, bytes]:
    out: Dict[str, bytes] = {}
    off = 0
    fields = FIELD_ORDER if not uniform else FIELD_ORDER[1:]
    for name in fields:
        (length,) = struct.unpack_from("i", buf, off)
        off += 4
        out[name] = buf[off : off + length]
        off += length
    if off != len(buf):
        raise ValueError(f"trailing {len(buf) - off} bytes in bitstream")
    return out
