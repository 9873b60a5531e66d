"""One-off TPU A/B of the device field coder's emission-packing step.

HEAD packs emitted rANS words with ONE global 2-operand stable sort over
L*T elements (rans_device.py:265) — 78.6 ms/192-frame batch in the m8
profile, 16% of the encode graph.  Candidates keep the output prefix
byte-identical (packed[:n_words], counts, states) while replacing the
global sort with:

  lane:   per-lane SINGLE-operand sort of (emission-key<<16 | word) packed
          u32 — batched last-axis sorts are the cheap TPU case (log^2(T)
          bitonic stages instead of log^2(L*T), one operand instead of two)
  + concat variants for the ragged lane-major concatenation:
      flat: sum of L masked rows each placed by ONE dynamic slice from a
            [zeros(n) | row | zeros(n)] buffer (no scatter, no per-element
            gather; rows never overlap because tails are masked to zero)
      tree: pairwise merge, halving row count and doubling width per level
            (5 levels for L=32) — same slice trick at (3*width) buffers,
            O(n) traffic per level instead of O(L*n) total

Small program: compiles in seconds remotely, unlike the full encode graph.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from rpcc_tpu.ops.rans import normalize_freqs
from rpcc_tpu.ops.rans_device import (
    _expand_sorted_runs,
    recip_from_freq,
    rans_encode_scan,
)

L, T = 32, 4096
A, C = 512, 4
B = 64
N_LIVE = 122800


def _front(sym3d, ctx3d, n_live):
    """HEAD front end (histogram tables + scan) -> words/emits/counts/states."""
    n = L * T
    K = C * A
    key = (ctx3d * A + sym3d).reshape(-1)
    live_mask = jnp.arange(n, dtype=jnp.int32) < n_live
    live_lane = jnp.clip(n_live - jnp.arange(L, dtype=jnp.int32) * T, 0, T)
    key_h = jnp.where(live_mask, key, K)
    iota = jnp.arange(n, dtype=jnp.int32)
    key_s, pos_s = jax.lax.sort((key_h, iota), num_keys=1, is_stable=True)
    counts_h = jnp.concatenate([
        (key_h[:, None] == jnp.arange(c0, c0 + 128, dtype=key_h.dtype))
        .sum(0, dtype=jnp.int32)
        for c0 in range(0, K, 128)
    ])
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_h)]
    )
    freqs = jax.vmap(normalize_freqs)(counts_h.reshape(C, A))
    freqs_flat = freqs.reshape(-1)
    cums2 = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(freqs, -1)[:, :-1]], axis=1
    )
    cums_flat = cums2.reshape(-1)
    fc_flat = freqs_flat * (1 << 15) + cums_flat
    fc_s = _expand_sorted_runs(fc_flat, bounds[: K + 1], n)
    _, fc_o = jax.lax.sort((pos_s, fc_s), num_keys=1)
    fc_all = fc_o.astype(jnp.uint32).reshape(L, T)
    f_all = fc_all >> 15
    c_all = fc_all & jnp.uint32((1 << 15) - 1)
    r_all = recip_from_freq(f_all)
    rev = slice(None, None, -1)
    t_arange = jnp.arange(T, dtype=jnp.int32)
    active_lt = t_arange[None, :] < live_lane[:, None]
    words_rev, emit_rev, states = rans_encode_scan(
        sym3d.T[rev], f_all.T[rev], c_all.T[rev], r_all.T[rev],
        active_lt.T[rev],
    )
    words_lt = words_rev.T
    emit_lt = emit_rev.T
    counts = emit_lt.sum(axis=1).astype(jnp.int32)
    return words_lt, emit_lt, counts, states


def pack_global(words_lt, emit_lt, counts):
    """HEAD: one global 2-operand stable sort."""
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    lane = jnp.arange(L, dtype=jnp.int32)[:, None]
    big = jnp.int32(L * T)
    k_pack = jnp.where(emit_lt, lane * T + t_idx, big).reshape(-1)
    _, packed = jax.lax.sort(
        (k_pack, words_lt.reshape(-1)), num_keys=1, is_stable=True
    )
    return packed


def _lane_sorted_rows(words_lt, emit_lt, counts):
    """Per-lane packed single-operand sort -> (L, T) rows, tails zeroed."""
    t_idx = jnp.arange(T, dtype=jnp.int32)
    k_lane = jnp.where(emit_lt, t_idx[None, :], T).astype(jnp.uint32)
    pk = (k_lane << jnp.uint32(16)) | words_lt.astype(jnp.uint32)
    pk_s = jax.lax.sort(pk, dimension=1)
    w = (pk_s & jnp.uint32(0xFFFF)).astype(jnp.uint16)
    return jnp.where(t_idx[None, :] < counts[:, None], w, 0)


def pack_lane_flat(words_lt, emit_lt, counts):
    w = _lane_sorted_rows(words_lt, emit_lt, counts)
    n = L * T
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )  # (L,) lane start offsets
    zl = jnp.zeros((L, n), jnp.uint16)
    buf = jnp.concatenate([zl, w, zl], axis=1)  # (L, 2n+T)
    starts = n - offs
    contrib = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (n,))
    )(buf, starts)
    return contrib.sum(axis=0, dtype=jnp.uint16)


def pack_lane_tree(words_lt, emit_lt, counts):
    rows = _lane_sorted_rows(words_lt, emit_lt, counts)
    c = counts
    width = T
    while rows.shape[0] > 1:
        R = rows.shape[0] // 2
        left, right = rows[0::2], rows[1::2]
        cl, cr = c[0::2], c[1::2]
        zl = jnp.zeros((R, width), jnp.uint16)
        lpad = jnp.concatenate([left, zl], axis=1)       # (R, 2w)
        rbuf = jnp.concatenate([zl, right, zl], axis=1)  # (R, 3w)
        starts = width - cl
        rshift = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (2 * width,))
        )(rbuf, starts)
        rows = lpad + rshift
        c = cl + cr
        width *= 2
    return rows[0]


PACKS = {"global": pack_global, "lane_flat": pack_lane_flat,
         "lane_tree": pack_lane_tree}


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    raw = rng.zipf(1.3, size=(B, L, T)).astype(np.int64)
    sym = np.minimum(raw - 1, A - 1).astype(np.int32)
    prev = np.concatenate([np.zeros((B, L, 1), np.int32), sym[:, :, :-1]], -1)
    mag = (prev + 1) // 2
    ctx = (mag >= 1).astype(np.int32) + (mag >= 3) + (mag >= 8)
    sym_d = jnp.asarray(sym)
    ctx_d = jnp.asarray(ctx)
    nl = jnp.full((B,), N_LIVE, jnp.int32)

    outs = {}
    for name, pack in PACKS.items():
        def coder(s, c, n, _p=pack):
            words_lt, emit_lt, counts, states = _front(s, c, n)
            return _p(words_lt, emit_lt, counts), counts.sum(), counts, states
        fn = jax.jit(jax.vmap(coder))
        t0 = time.perf_counter()
        out = fn(sym_d, ctx_d, nl)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(sym_d, ctx_d, nl)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        outs[name] = tuple(np.asarray(o) for o in out)
        print(f"{name:10s}: {dt*1e3/B:7.3f} ms/frame "
              f"({dt*1e3:.1f} ms/batch, compile {compile_s:.1f}s)", flush=True)

    base = outs["global"]
    for name, o in outs.items():
        nw = base[1]
        pref = all(
            np.array_equal(o[0][i, : nw[i]], base[0][i, : nw[i]])
            for i in range(B)
        )
        rest = all(np.array_equal(a, b) for a, b in zip(base[1:], o[1:]))
        print(f"prefix-identical[{name}]: {pref and rest}", flush=True)


if __name__ == "__main__":
    main()
