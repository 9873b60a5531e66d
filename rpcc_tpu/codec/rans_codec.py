"""Hybrid device-rANS container (method name ``rans``).

The dominant bitstream field is the cluster-ordered quantized residual
stream.  It is not i.i.d. — residuals vary smoothly along the row-major
cluster order (measured on KITTI: H(q) = 6.3 bits/symbol but H(Δq) = 2.36,
vs bzip2's 2.49 achieved bits/symbol) — so the model here is **delta +
zigzag + order-0 rANS**, which beats bzip2's ratio on the residual field
while running as a TPU kernel (ops/rans.py) instead of serial host code.

Integer fields (int16/uint16 ndarrays) take the delta-rANS path; small side
fields (packed contour bits, float32 model table, salience bytes) fall back
to bzip2 — they are a few KB and not worth a device round trip.

Delta container layout (little-endian):
  u8 magic 'D'   u8 log2(lanes)   u32 n_symbols   u16 first_symbol(raw zigzag of q0 is NOT stored; q0 itself)
  u16 n_escapes  [u16 escape raw values ...]      (|Δ| >= ESCAPE_MIN, rare)
  u16 n_present  [u16 symbol ids][u16 freqs]      (sparse normalized table)
  u32 states[lanes]   u16 counts[lanes]   u16 words[sum(counts)]
Bzip2 fallback: u8 magic 'B' + bzip2 stream.
"""

from __future__ import annotations

import bz2
import struct

import numpy as np

from rpcc_tpu.ops import rans as _r

MAGIC_DELTA = 0x44  # 'D'
MAGIC_BZ = 0x42  # 'B'
ALPHABET = 512
ESCAPE = ALPHABET - 1  # symbol id reserved for |delta| outside table range
MAX_LANES = 128


def _lanes_for(n: int) -> int:
    lanes = 1
    while lanes < MAX_LANES and lanes * 64 < n:
        lanes *= 2
    return lanes


def _zigzag(d: np.ndarray) -> np.ndarray:
    return np.where(d >= 0, 2 * d, -2 * d - 1).astype(np.int64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    return np.where(z % 2 == 0, z // 2, -(z + 1) // 2).astype(np.int64)


# Fields above this size always take the device delta-rANS path; smaller
# fields are cheap enough to try both and keep the smaller container.
BIG_FIELD_BYTES = 64 * 1024


def compress(data, lanes: int | None = None) -> bytes:
    if isinstance(data, np.ndarray) and data.dtype in (np.int16, np.uint16, np.int32):
        delta = _compress_delta(data, lanes)
        if data.nbytes > BIG_FIELD_BYTES:
            return delta
        bz = bytes([MAGIC_BZ]) + bz2.compress(data.tobytes())
        return min(delta, bz, key=len)
    raw = data.tobytes() if isinstance(data, np.ndarray) else bytes(data)
    return bytes([MAGIC_BZ]) + bz2.compress(raw)


def decompress(blob: bytes) -> bytes:
    if blob[0] == MAGIC_BZ:
        return bz2.decompress(blob[1:])
    if blob[0] == MAGIC_DELTA:
        return _decompress_delta(blob)
    raise ValueError("unknown rans container magic")


def _compress_delta(arr: np.ndarray, lanes: int | None) -> bytes:
    dtype = arr.dtype
    q = arr.astype(np.int64).reshape(-1)
    n = q.shape[0]
    if n == 0:
        return struct.pack("<BBIi", MAGIC_DELTA, 0, 0, 0) + b"\x00\x00\x00\x00"
    if lanes is None:
        lanes = _lanes_for(n)

    d = np.empty(n, np.int64)
    d[0] = 0
    d[1:] = np.diff(q)
    zz = _zigzag(d)
    esc_mask = zz >= ESCAPE
    escapes = zz[esc_mask]
    sym = np.where(esc_mask, ESCAPE, zz).astype(np.int32)

    code, freqs = _r.encode_stream(
        np.asarray(sym), ALPHABET, lanes
    )
    freqs = np.asarray(freqs).astype(np.int64)
    counts = np.asarray(code.counts)
    states = np.asarray(code.states).astype("<u4")
    words = np.asarray(code.words)
    packed_words = (
        np.concatenate([words[i, : counts[i]] for i in range(lanes)]).astype("<u2")
        if counts.sum()
        else np.zeros(0, "<u2")
    )

    present = np.nonzero(freqs)[0]
    out = [
        struct.pack(
            "<BBIi", MAGIC_DELTA, lanes.bit_length() - 1, n, int(q[0])
        ),
        struct.pack("<I", escapes.shape[0]),
        escapes.astype("<u4").tobytes(),  # zigzag deltas can exceed u16
        struct.pack("<H", present.shape[0]),
        present.astype("<u2").tobytes(),
        freqs[present].astype("<u2").tobytes(),
        states.tobytes(),
        counts.astype("<u2").tobytes(),
        packed_words.tobytes(),
        struct.pack("<B", _dtype_code(dtype)),
    ]
    return b"".join(out)


def _dtype_code(dt) -> int:
    return {np.dtype(np.int16): 0, np.dtype(np.uint16): 1, np.dtype(np.int32): 2}[np.dtype(dt)]


_CODE_DTYPE = {0: np.int16, 1: np.uint16, 2: np.int32}


def _decompress_delta(blob: bytes) -> bytes:
    magic, log_lanes, n, q0 = struct.unpack_from("<BBIi", blob, 0)
    off = 10
    if n == 0:
        return b""
    lanes = 1 << log_lanes
    (n_esc,) = struct.unpack_from("<I", blob, off)
    off += 4
    escapes = np.frombuffer(blob, "<u4", n_esc, off).astype(np.int64)
    off += 4 * n_esc
    (n_present,) = struct.unpack_from("<H", blob, off)
    off += 2
    present = np.frombuffer(blob, "<u2", n_present, off).astype(np.int64)
    off += 2 * n_present
    pfreqs = np.frombuffer(blob, "<u2", n_present, off).astype(np.int64)
    off += 2 * n_present
    freqs = np.zeros(ALPHABET, np.int32)
    freqs[present] = pfreqs
    states = np.frombuffer(blob, "<u4", lanes, off).astype(np.uint32)
    off += 4 * lanes
    counts = np.frombuffer(blob, "<u2", lanes, off).astype(np.int32)
    off += 2 * lanes
    n_words = int(counts.sum())
    packed = np.frombuffer(blob, "<u2", n_words, off).astype(np.uint16)
    off += 2 * n_words
    (dt_code,) = struct.unpack_from("<B", blob, off)

    T = max(1, -(-n // lanes))
    words = np.zeros((lanes, T), np.uint16)
    c = 0
    for i in range(lanes):
        words[i, : counts[i]] = packed[c : c + counts[i]]
        c += counts[i]
    code = _r.RansCode(words, counts, states)
    sym = np.asarray(_r.decode_stream(code, np.asarray(freqs), T))[:n].astype(np.int64)

    zz = sym.copy()
    if n_esc:
        zz[sym == ESCAPE] = escapes
    d = _unzigzag(zz)
    d[0] = 0
    q = q0 + np.cumsum(d)
    return q.astype(_CODE_DTYPE[dt_code]).tobytes()
