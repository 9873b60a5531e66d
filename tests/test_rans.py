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


def test_native_and_jax_kernels_bit_identical():
    """The C++ rANS kernels must produce byte-identical containers to the
    jax kernels, and each must decode the other's output."""
    import numpy as np

    from rpcc_tpu.codec import rans_codec, rans_native
    from rpcc_tpu.ops import rans as _r

    if not rans_native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    sym3d = rng.integers(0, 120, (3, 8, 256)).astype(np.int32)
    ctx3d = rans_codec._zigzag_ctx_np(sym3d)

    w_n, c_n, s_n, f_n = rans_native.encode_ctx_batch(sym3d, ctx3d, 512, _r.NUM_CTX)
    import jax.numpy as jnp

    code, freqs_j = _r.encode_streams_batch_ctx(jnp.asarray(sym3d), 512)
    assert np.array_equal(f_n, np.asarray(freqs_j))
    assert np.array_equal(c_n, np.asarray(code.counts))
    assert np.array_equal(s_n, np.asarray(code.states))
    # words agree on the valid (front-packed) prefixes
    w_j = np.asarray(code.words)
    for b in range(3):
        for l in range(8):
            n = c_n[b, l]
            assert np.array_equal(w_n[b, l, :n], w_j[b, l, :n])

    # cross-decode: native decodes the jax code and vice versa
    sym_nat = rans_native.decode_ctx_batch(
        w_j, np.asarray(code.counts), np.asarray(code.states),
        np.asarray(freqs_j), 256, rans_native.MODE_ZIGZAG,
    )
    assert np.array_equal(sym_nat.reshape(3, 8, 256), sym3d)
    code_n = _r.RansCode(jnp.asarray(w_n), jnp.asarray(c_n), jnp.asarray(s_n))
    sym_jax = np.asarray(_r.decode_streams_batch_ctx(code_n, jnp.asarray(f_n), 256))
    assert np.array_equal(sym_jax.reshape(3, 8, 256), sym3d)


def test_contour_container_backends_agree():
    import numpy as np

    from rpcc_tpu.codec import rans_codec, rans_native

    if not rans_native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    packed = [
        np.packbits(((rng.random((16, 256)) < 0.3)).astype(np.uint8).reshape(-1))
        for _ in range(4)
    ]
    blobs_native = rans_codec._compress_bits_batch(packed, 16, 256)
    try:
        rans_codec._RANS_DEVICE = "jax-test"  # disable native
        blobs_jax = rans_codec._compress_bits_batch(packed, 16, 256)
        assert blobs_native == blobs_jax
        recs = rans_codec.decompress_contour_batch(blobs_native)
    finally:
        rans_codec._RANS_DEVICE = "cpu"
    recs2 = rans_codec.decompress_contour_batch(blobs_jax)
    assert recs == recs2 == [p.tobytes() for p in packed]
