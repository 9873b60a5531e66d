"""rANS kernel tests: exact roundtrip, compression ratio sanity, edge cases."""

import numpy as np
import jax.numpy as jnp

from rpcc_tpu.ops.rans import (
    RansCode,
    cumulative,
    decode_stream,
    encode_stream,
    normalize_freqs,
    pack_symbols,
    rans_decode,
    rans_encode,
    slot_to_symbol,
    M,
)


def roundtrip(flat, alphabet, lanes=16):
    flat = jnp.asarray(flat, jnp.int32)
    code, freqs = encode_stream(flat, alphabet, lanes)
    n = flat.shape[0]
    T = max(1, -(-n // lanes))
    dec = decode_stream(code, freqs, T)
    return np.asarray(dec)[:n], code, freqs


def test_normalize_freqs_sums_to_M():
    rng = np.random.default_rng(0)
    for _ in range(5):
        counts = rng.integers(0, 1000, 300)
        f = np.asarray(normalize_freqs(jnp.asarray(counts)))
        assert f.sum() == M
        assert (f[counts > 0] >= 1).all()
        assert (f[counts == 0] == 0).all()


def test_rans_roundtrip_skewed():
    rng = np.random.default_rng(1)
    # Laplacian-ish quantized residuals mapped to symbols
    q = np.rint(rng.laplace(0, 6, 20000)).astype(np.int64)
    sym = np.clip(q + 128, 0, 255)
    dec, code, freqs = roundtrip(sym, 256, lanes=32)
    np.testing.assert_array_equal(dec, sym)

    # coded size should beat raw 8 bits/symbol substantially
    n_words = int(np.asarray(code.counts).sum())
    coded_bits = n_words * 16 + 32 * 32  # words + states
    raw_bits = sym.shape[0] * 8
    assert coded_bits < 0.75 * raw_bits

    # and be close to the empirical entropy
    p = np.bincount(sym, minlength=256) / sym.shape[0]
    ent = -(p[p > 0] * np.log2(p[p > 0])).sum() * sym.shape[0]
    assert coded_bits < 1.1 * ent + 32 * 64


def test_rans_roundtrip_uniformish():
    rng = np.random.default_rng(2)
    sym = rng.integers(0, 200, 5000)
    dec, _, _ = roundtrip(sym, 256, lanes=8)
    np.testing.assert_array_equal(dec, sym)


def test_rans_all_same_symbol():
    sym = np.full(1000, 7)
    dec, code, _ = roundtrip(sym, 16, lanes=4)
    np.testing.assert_array_equal(dec, sym)
    # certain event costs ~nothing
    assert int(np.asarray(code.counts).sum()) == 0


def test_rans_binary_alphabet():
    rng = np.random.default_rng(3)
    sym = (rng.random(30000) < 0.06).astype(np.int64)  # contour-like bits
    dec, code, _ = roundtrip(sym, 2, lanes=32)
    np.testing.assert_array_equal(dec, sym)
    n_words = int(np.asarray(code.counts).sum())
    # H(0.06) ~ 0.327 bits/symbol; raw packbits is 1 bit/symbol
    assert n_words * 16 < 0.45 * sym.shape[0]


def test_rans_tiny_and_empty():
    dec, _, _ = roundtrip(np.array([3]), 8, lanes=4)
    np.testing.assert_array_equal(dec, [3])
    dec, _, _ = roundtrip(np.array([], dtype=np.int64), 8, lanes=4)
    assert dec.shape[0] == 0
