"""Interleaved-lane rANS entropy coder — fully on device.

This is the framework's own addition (method name ``rans``): the reference
ships only host byte codecs (bzip2/deflate/lz4, ``utils/compress_utils.py:
232-310``), which serialize on the CPU and bound datalist throughput.  Here
the entropy stage itself is an XLA program: L independent rANS lanes advance
in lockstep over a ``lax.scan``, so each scan step is one (L,)-wide VPU
update and the whole batch of frames vmaps into (B*L,)-wide steps.

Scheme: order-0 adaptive-per-frame model; 32-bit state, 16-bit renormalized
IO, PROB_BITS=14.  Encoding walks symbols in reverse so decoding streams
forward.  At most one word is emitted per symbol (state < 2^32 and one shift
re-establishes the invariant), so each lane's word buffer is (T,) and the
true word counts travel in the container header.

Wire format is produced by codec/rans_codec.py; this module is the pure
kernel: fixed-shape arrays in, fixed-shape arrays out.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PROB_BITS = 14
M = 1 << PROB_BITS  # total frequency
RANS_L = 1 << 16  # state lower bound
IO_BITS = 16
WORD_MASK = (1 << IO_BITS) - 1


def normalize_freqs(counts: jnp.ndarray) -> jnp.ndarray:
    """Deterministically normalize histogram ``counts`` to sum exactly M.

    Every present symbol keeps freq >= 1; the residual correction lands on
    the most frequent symbol.  When the bump-to-1 of many rare symbols
    overdraws the budget so far that the top symbol cannot absorb the
    (negative) correction — a pathological near-uniform histogram over a
    large alphabet — a repair pass re-floors with 1 reserved per present
    symbol (``floor(c * (M - A_pos) / total) + 1``), whose correction is
    >= 0 by construction, so the table is always valid (present symbols
    >= 1, sum == M).  The repair is bit-identical across the jax / numpy /
    C++ implementations.
    """
    counts = counts.astype(jnp.int32)
    present = counts > 0
    total = jnp.maximum(jnp.sum(counts), 1)
    # f32 is exact here: counts * (M/total) <= M = 2^14 << 2^24 mantissa.
    f = jnp.floor(counts.astype(jnp.float32) * (M / total.astype(jnp.float32)))
    f = f.astype(jnp.int32)
    f = jnp.where(present & (f == 0), 1, f)
    delta = M - jnp.sum(f)
    top = jnp.argmax(f)
    ok = f[top] + delta >= 1
    # Repair candidate: reserve 1 per present symbol up front.
    a_pos = jnp.sum(present.astype(jnp.int32))
    scale2 = (M - a_pos).astype(jnp.float32) / total.astype(jnp.float32)
    f2 = jnp.floor(counts.astype(jnp.float32) * scale2).astype(jnp.int32)
    f2 = f2 + present.astype(jnp.int32)
    delta2 = M - jnp.sum(f2)  # >= 0: sum(floor) <= M - a_pos
    top2 = jnp.argmax(f2)
    return jnp.where(ok, f.at[top].add(delta), f2.at[top2].add(delta2))


def cumulative(freqs: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(freqs)[:-1]])


def slot_to_symbol(freqs: jnp.ndarray) -> jnp.ndarray:
    """(M,) lookup: slot -> symbol (decode side)."""
    a = freqs.shape[0]
    return jnp.repeat(
        jnp.arange(a, dtype=jnp.int32), freqs, total_repeat_length=M
    )


class RansCode(NamedTuple):
    words: jnp.ndarray  # (L, T) uint16 emitted words, front-packed per lane
    counts: jnp.ndarray  # (L,) int32 number of valid words per lane
    states: jnp.ndarray  # (L,) uint32 final states


def rans_encode(symbols: jnp.ndarray, freqs: jnp.ndarray, cum: jnp.ndarray) -> RansCode:
    """Encode (L, T) int32 symbols; lane i encodes its row (reverse order)."""
    L, T = symbols.shape
    f_all = freqs[symbols].astype(jnp.uint32)  # (L, T)
    c_all = cum[symbols].astype(jnp.uint32)

    def step(carry, t):
        x, words, cnt = carry
        idx = T - 1 - t
        f = f_all[:, idx]
        c = c_all[:, idx]
        # renorm: emit low 16 bits while x >= f << (32 - PROB_BITS - IO_BITS+16)
        emit = (x >> jnp.uint32(18)) >= f  # x >= f * 2^18, overflow-safe
        word = (x & WORD_MASK).astype(jnp.uint16)
        pos = jnp.where(emit, cnt, T)
        words = words.at[jnp.arange(L), pos].set(word, mode="drop")
        cnt = cnt + emit.astype(jnp.int32)
        x = jnp.where(emit, x >> jnp.uint32(IO_BITS), x)
        # encode
        x = (x // f) * jnp.uint32(M) + c + (x % f)
        return (x, words, cnt), None

    x0 = jnp.full((L,), RANS_L, jnp.uint32)
    words0 = jnp.zeros((L, T), jnp.uint16)
    cnt0 = jnp.zeros((L,), jnp.int32)
    (x, words, cnt), _ = jax.lax.scan(step, (x0, words0, cnt0), jnp.arange(T))
    return RansCode(words, cnt, x)


def rans_decode(
    code: RansCode,
    freqs: jnp.ndarray,
    cum: jnp.ndarray,
    slot2sym: jnp.ndarray,
    T: int,
) -> jnp.ndarray:
    """Decode back to (L, T) int32 symbols (forward order)."""
    words, counts, states = code
    L = states.shape[0]
    freqs_u = freqs.astype(jnp.uint32)
    cum_u = cum.astype(jnp.uint32)

    def step(carry, t):
        x, cur = carry
        slot = x & jnp.uint32(M - 1)
        s = slot2sym[slot]  # (L,)
        f = freqs_u[s]
        c = cum_u[s]
        x = f * (x >> jnp.uint32(PROB_BITS)) + slot - c
        need = x < jnp.uint32(RANS_L)
        nxt = jnp.where(need, cur - 1, cur)
        w = words[jnp.arange(L), jnp.maximum(nxt, 0)].astype(jnp.uint32)
        x = jnp.where(need, (x << jnp.uint32(IO_BITS)) | w, x)
        return (x, nxt), s

    # Lanes consume their word buffers from the back (LIFO vs emission).
    (x, cur), syms = jax.lax.scan(step, (states, counts), jnp.arange(T))
    return syms.T.astype(jnp.int32)  # (L, T)


# ------------------------------------------------------------------ helpers
def pack_symbols(flat: jnp.ndarray, lanes: int, pad_symbol: int) -> Tuple[jnp.ndarray, int]:
    """Pad a flat symbol stream to lanes*T and reshape to (lanes, T)."""
    n = flat.shape[0]
    T = max(1, -(-n // lanes))  # T >= 1 keeps scans/indexing well-formed
    padded = jnp.full((lanes * T,), pad_symbol, flat.dtype).at[:n].set(flat)
    return padded.reshape(lanes, T), T


@functools.partial(jax.jit, static_argnames=("alphabet", "lanes"))
def encode_stream(flat_symbols: jnp.ndarray, alphabet: int, lanes: int = 128):
    """One-shot device encode of a flat int32 symbol stream.

    Returns (RansCode, freqs (A,)).  The histogram includes the padding
    (symbol 0) so decode is self-consistent; callers slice off the tail.
    """
    sym2d, _ = pack_symbols(flat_symbols, lanes, pad_symbol=0)
    counts = jnp.bincount(sym2d.reshape(-1), length=alphabet)
    freqs = normalize_freqs(counts)
    cum = cumulative(freqs)
    return rans_encode(sym2d, freqs, cum), freqs


@functools.partial(jax.jit, static_argnames=("T",))
def decode_stream(code: RansCode, freqs: jnp.ndarray, T: int) -> jnp.ndarray:
    cum = cumulative(freqs)
    s2s = slot_to_symbol(freqs)
    return rans_decode(code, freqs, cum, s2s, T).reshape(-1)


# ------------------------------------------------ context-modeled variants
def lane_live(n, L: int, T: int) -> jnp.ndarray:
    """Per-lane live symbol counts for a flat stream of length ``n`` laid out
    (L, T) row-major: lane l codes only flat positions < n (LIVE-AWARE
    lanes — tail padding is never entropy-coded; the decoder reconstructs
    the lane lengths from the container's ``n``)."""
    return jnp.clip(n - jnp.arange(L, dtype=jnp.int32) * T, 0, T)


def rans_encode_ctx(
    symbols: jnp.ndarray,  # (L, T) int32
    ctx: jnp.ndarray,  # (L, T) int32 in [0, C) — context of each symbol
    freqs: jnp.ndarray,  # (C, A)
    cums: jnp.ndarray,  # (C, A)
    live: jnp.ndarray | None = None,  # (L,) live symbols per lane
) -> RansCode:
    """rANS with a per-symbol model choice (context from already-coded data,
    so the decoder can reproduce it).  Lane positions >= ``live`` are
    skipped entirely (None codes everything)."""
    L, T = symbols.shape
    f_all = freqs[ctx, symbols].astype(jnp.uint32)  # (L, T)
    c_all = cums[ctx, symbols].astype(jnp.uint32)
    if live is None:
        live = jnp.full((L,), T, jnp.int32)

    def step(carry, t):
        x, words, cnt = carry
        idx = T - 1 - t
        active = idx < live
        f = f_all[:, idx]
        c = c_all[:, idx]
        emit = active & ((x >> jnp.uint32(18)) >= f)
        word = (x & WORD_MASK).astype(jnp.uint16)
        pos = jnp.where(emit, cnt, T)
        words = words.at[jnp.arange(L), pos].set(word, mode="drop")
        cnt = cnt + emit.astype(jnp.int32)
        x = jnp.where(emit, x >> jnp.uint32(IO_BITS), x)
        x_new = (x // f) * jnp.uint32(M) + c + (x % f)
        x = jnp.where(active, x_new, x)
        return (x, words, cnt), None

    x0 = jnp.full((L,), RANS_L, jnp.uint32)
    words0 = jnp.zeros((L, T), jnp.uint16)
    cnt0 = jnp.zeros((L,), jnp.int32)
    (x, words, cnt), _ = jax.lax.scan(step, (x0, words0, cnt0), jnp.arange(T))
    return RansCode(words, cnt, x)


def rans_decode_ctx(
    code: RansCode,
    freqs: jnp.ndarray,  # (C, A)
    cums: jnp.ndarray,  # (C, A)
    slot2sym: jnp.ndarray,  # (C, M)
    ctx_fn,  # prev_symbol (L,) int32 -> context (L,) int32
    T: int,
    live: jnp.ndarray | None = None,  # (L,)
) -> jnp.ndarray:
    """Decode with contexts derived from the previously decoded symbol in
    each lane (lane starts use context 0).  Lane positions >= ``live``
    decode to 0 without touching the state (live-aware lanes)."""
    words, counts, states = code
    L = states.shape[0]
    freqs_u = freqs.astype(jnp.uint32)
    cums_u = cums.astype(jnp.uint32)
    if live is None:
        live = jnp.full((L,), T, jnp.int32)

    def step(carry, t):
        x, cur, prev = carry
        active = t < live
        c_id = jnp.where(t == 0, jnp.zeros((L,), jnp.int32), ctx_fn(prev))
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        s = slot2sym[c_id, slot]
        f = freqs_u[c_id, s]
        c = cums_u[c_id, s]
        x_new = f * (x >> jnp.uint32(PROB_BITS)) + slot.astype(jnp.uint32) - c
        need = active & (x_new < jnp.uint32(RANS_L))
        nxt = jnp.where(need, cur - 1, cur)
        w = words[jnp.arange(L), jnp.maximum(nxt, 0)].astype(jnp.uint32)
        x_new = jnp.where(need, (x_new << jnp.uint32(IO_BITS)) | w, x_new)
        x = jnp.where(active, x_new, x)
        s = jnp.where(active, s, 0)
        return (x, nxt, s), s

    init = (states, counts, jnp.zeros((L,), jnp.int32))
    (_, _, _), syms = jax.lax.scan(step, init, jnp.arange(T))
    return syms.T.astype(jnp.int32)  # (L, T)


# ------------------------------------------------------- batched (per frame)
def _hist_sorted(sym: jnp.ndarray, alphabet: int) -> jnp.ndarray:
    """(N,) symbols -> (A,) counts via sort + searchsorted (vmap-friendly:
    a scatter-add histogram crawls the TPU scalar core)."""
    s = jnp.sort(sym)
    ids = jnp.arange(alphabet + 1, dtype=sym.dtype)
    bounds = jnp.searchsorted(s, ids, side="left")
    return (bounds[1:] - bounds[:-1]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("alphabet",))
def encode_streams_batch(sym3d: jnp.ndarray, alphabet: int):
    """Encode (B, L, T) int32 symbols: per-frame model, all frames in one call.

    Returns (RansCode with (B, L, T)/(B, L) leaves, freqs (B, A)).
    """
    B = sym3d.shape[0]
    counts = jax.vmap(lambda s: _hist_sorted(s.reshape(-1), alphabet))(sym3d)
    freqs = jax.vmap(normalize_freqs)(counts)
    cums = jax.vmap(cumulative)(freqs)
    code = jax.vmap(rans_encode)(sym3d, freqs, cums)
    return code, freqs


@functools.partial(jax.jit, static_argnames=("T",))
def decode_streams_batch(code: RansCode, freqs: jnp.ndarray, T: int) -> jnp.ndarray:
    """Decode (B, L, *) codes back to (B, L*T) int32 symbols."""
    cums = jax.vmap(cumulative)(freqs)
    s2s = jax.vmap(slot_to_symbol)(freqs)
    sym = jax.vmap(lambda c, f, cu, s: rans_decode(c, f, cu, s, T))(
        code, freqs, cums, s2s
    )
    return sym.reshape(sym.shape[0], -1)


# --------------------------------------------- batched context-modeled API
def zigzag_magnitude_context(prev_sym: jnp.ndarray) -> jnp.ndarray:
    """Context = bucket(|prev delta|) with edges [1, 3, 8] — measured to cut
    the residual stream's entropy from 2.36 to 2.16 bits/symbol on KITTI.
    ``prev_sym`` is the zigzag symbol: |d| = (sym + 1) // 2 (ESCAPE maps to
    the largest bucket, as intended)."""
    mag = (prev_sym + 1) // 2
    return (
        (mag >= 1).astype(jnp.int32)
        + (mag >= 3).astype(jnp.int32)
        + (mag >= 8).astype(jnp.int32)
    )


def bit_context(prev_sym: jnp.ndarray) -> jnp.ndarray:
    """Binary context = the previous bit.  With the contour field laid out
    column-major per lane, the lane's previous symbol IS the bit above —
    the reference seg map's strongest single predictor (~0.25 bits/px vs
    0.30 order-0)."""
    return prev_sym


def wavefront_bit_context(prev_sym: jnp.ndarray) -> jnp.ndarray:
    """4-context binary model for the diagonal-wavefront contour layout
    (lane r = image row r, delayed r steps): at step t lane r holds pixel
    (r, t-r), its own previous symbol is the LEFT neighbor and lane r-1's
    previous symbol is the neighbor ABOVE — ctx = 2*above + left.
    Measured on KITTI: H(bit | above, left) = 0.226 vs 0.277 order-0."""
    above = jnp.concatenate([jnp.zeros_like(prev_sym[..., :1]), prev_sym[..., :-1]], axis=-1)
    return 2 * above + prev_sym


NUM_CTX = 4  # contexts of the zigzag-magnitude model


def _ctx_of(sym3d: jnp.ndarray, ctx_fn) -> jnp.ndarray:
    """Per-symbol context from the previous symbol in the lane (0 at starts)."""
    prev = jnp.concatenate(
        [jnp.zeros_like(sym3d[:, :, :1]), sym3d[:, :, :-1]], axis=-1
    )
    ctx = ctx_fn(prev)
    return ctx.at[:, :, 0].set(0)


@functools.partial(jax.jit, static_argnames=("alphabet", "ctx_fn", "num_ctx"))
def encode_streams_batch_ctx(
    sym3d: jnp.ndarray,
    alphabet: int,
    ctx_fn=zigzag_magnitude_context,
    num_ctx: int = NUM_CTX,
    ns: jnp.ndarray | None = None,  # (B,) live stream lengths
):
    """Context-modeled batch encode; returns (code, freqs (B, C, A)).

    With ``ns`` the lanes are live-aware: tail padding is neither counted in
    the histograms nor entropy-coded."""
    B, L, T = sym3d.shape
    ctx = _ctx_of(sym3d, ctx_fn)
    if ns is None:
        ns = jnp.full((B,), L * T, jnp.int32)
    lives = jax.vmap(lambda n: lane_live(n, L, T))(ns)  # (B, L)

    def hist_one(sym_f, ctx_f, n):
        joint = ctx_f * alphabet + sym_f
        joint = jnp.where(jnp.arange(L * T) < n, joint, num_ctx * alphabet)
        return _hist_sorted(joint, num_ctx * alphabet + 1)[:-1].reshape(
            num_ctx, alphabet
        )

    counts = jax.vmap(hist_one)(
        sym3d.reshape(B, -1), ctx.reshape(B, -1), ns
    )  # (B, C, A)
    freqs = jax.vmap(jax.vmap(normalize_freqs))(counts)
    cums = jax.vmap(jax.vmap(cumulative))(freqs)
    code = jax.vmap(rans_encode_ctx)(sym3d, ctx, freqs, cums, lives)
    return code, freqs


@functools.partial(jax.jit, static_argnames=("alphabet", "num_ctx"))
def encode_streams_batch_ctx_explicit(
    sym3d: jnp.ndarray, ctx3d: jnp.ndarray, alphabet: int, num_ctx: int
):
    """Batch encode under caller-supplied per-symbol contexts (the decoder
    must be able to reproduce them from already-decoded symbols)."""

    def hist_one(sym_f, ctx_f):
        joint = ctx_f * alphabet + sym_f
        return _hist_sorted(joint, num_ctx * alphabet).reshape(num_ctx, alphabet)

    counts = jax.vmap(hist_one)(
        sym3d.reshape(sym3d.shape[0], -1), ctx3d.reshape(ctx3d.shape[0], -1)
    )
    freqs = jax.vmap(jax.vmap(normalize_freqs))(counts)
    cums = jax.vmap(jax.vmap(cumulative))(freqs)
    code = jax.vmap(rans_encode_ctx)(sym3d, ctx3d, freqs, cums)
    return code, freqs


@functools.partial(jax.jit, static_argnames=("T", "ctx_fn"))
def decode_streams_batch_ctx(
    code: RansCode,
    freqs: jnp.ndarray,
    T: int,
    ctx_fn=zigzag_magnitude_context,
    lives: jnp.ndarray | None = None,  # (B, L) live symbols per lane
) -> jnp.ndarray:
    B = freqs.shape[0]
    L = code.states.shape[1]
    cums = jax.vmap(jax.vmap(cumulative))(freqs)
    s2s = jax.vmap(jax.vmap(slot_to_symbol))(freqs)
    if lives is None:
        lives = jnp.full((B, L), T, jnp.int32)
    sym = jax.vmap(
        lambda c, f, cu, s, lv: rans_decode_ctx(c, f, cu, s, ctx_fn, T, lv)
    )(code, freqs, cums, s2s, jnp.minimum(lives, T))
    return sym.reshape(sym.shape[0], -1)
