"""One-off TPU A/B of the device rANS field coder's two r5 experiment axes:

  - ss:   jnp.searchsorted default (binary-search while loop) vs method='sort'
  - pack: 4-payload position sort-back (f, c, recip ride the sort) vs packed
          (f*2^15+c one payload, recip recomputed via recip_from_freq)

Profiles ONLY the residual field coder (vmapped over a batch), synthetic
content shaped like the flagship m8 graph's residual stream (L=32, T=4096,
A=512, C=4, n_live ~ 122800).  Small programs compile in seconds remotely,
so the 4-combo sweep is cheap — unlike recompiling the full encode graph.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from rpcc_tpu.ops.rans import normalize_freqs, M
from rpcc_tpu.ops.rans_device import (
    _RECIP_NP,
    _expand_sorted_runs,
    recip_from_freq,
    rans_encode_scan,
)

L, T = 32, 4096
A, C = 512, 4
B = 64
N_LIVE = 122800


def field_coder(sym3d, ctx3d, n_live, ss_sort: bool, pack: bool):
    n = L * T
    K = C * A
    key = (ctx3d * A + sym3d).reshape(-1)
    live_mask = jnp.arange(n, dtype=jnp.int32) < n_live
    live_lane = jnp.clip(n_live - jnp.arange(L, dtype=jnp.int32) * T, 0, T)
    key_h = jnp.where(live_mask, key, K)
    iota = jnp.arange(n, dtype=jnp.int32)
    key_s, pos_s = jax.lax.sort((key_h, iota), num_keys=1, is_stable=True)
    if ss_sort:
        bounds = jnp.searchsorted(
            key_s, jnp.arange(K + 2, dtype=jnp.int32), method="sort"
        )
    else:
        bounds = jnp.searchsorted(key_s, jnp.arange(K + 2, dtype=jnp.int32))
    counts_h = (bounds[1:-1] - bounds[:-2]).astype(jnp.int32)
    freqs = jax.vmap(normalize_freqs)(counts_h.reshape(C, A))
    freqs_flat = freqs.reshape(-1)
    cums2 = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.cumsum(freqs, -1)[:, :-1]], axis=1
    )
    cums_flat = cums2.reshape(-1)
    if pack:
        fc_flat = freqs_flat * (1 << 15) + cums_flat
        fc_s = _expand_sorted_runs(fc_flat, bounds[: K + 1], n)
        _, fc_o = jax.lax.sort((pos_s, fc_s), num_keys=1)
        fc_all = fc_o.astype(jnp.uint32).reshape(L, T)
        f_all = fc_all >> 15
        c_all = fc_all & jnp.uint32((1 << 15) - 1)
        r_all = recip_from_freq(f_all)
    else:
        recip_np = jnp.asarray(_RECIP_NP)
        recip_flat = recip_np[jnp.clip(freqs_flat, 0, M)]
        f_s = _expand_sorted_runs(freqs_flat, bounds[: K + 1], n)
        c_s = _expand_sorted_runs(cums_flat, bounds[: K + 1], n)
        r_s = _expand_sorted_runs(recip_flat, bounds[: K + 1], n)
        _, f_o, c_o, r_o = jax.lax.sort((pos_s, f_s, c_s, r_s), num_keys=1)
        f_all = f_o.astype(jnp.uint32).reshape(L, T)
        c_all = c_o.astype(jnp.uint32).reshape(L, T)
        r_all = r_o.astype(jnp.uint32).reshape(L, T)

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
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    lane = jnp.arange(L, dtype=jnp.int32)[:, None]
    big = jnp.int32(L * T)
    k_pack = jnp.where(emit_lt, lane * T + t_idx, big).reshape(-1)
    _, packed = jax.lax.sort(
        (k_pack, words_lt.reshape(-1)), num_keys=1, is_stable=True
    )
    return packed, counts.sum(), counts, states


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    # zipf-ish residual symbols: mostly tiny, occasional big — matches the
    # zigzag stream's context spread
    raw = rng.zipf(1.3, size=(B, L, T)).astype(np.int64)
    sym = np.minimum(raw - 1, A - 1).astype(np.int32)
    prev = np.concatenate([np.zeros((B, L, 1), np.int32), sym[:, :, :-1]], -1)
    mag = (prev + 1) // 2
    ctx = (mag >= 1).astype(np.int32) + (mag >= 3) + (mag >= 8)
    sym_d = jnp.asarray(sym)
    ctx_d = jnp.asarray(ctx)
    nl = jnp.full((B,), N_LIVE, jnp.int32)

    results = {}
    outs = {}
    for ss_sort in (False, True):
        for pack in (False, True):
            name = f"ss={'sort' if ss_sort else 'bin '} pack={int(pack)}"
            fn = jax.jit(jax.vmap(
                lambda s, c, n, _ss=ss_sort, _pk=pack: field_coder(
                    s, c, n, _ss, _pk)
            ))
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
            results[name] = dt
            outs[name] = tuple(np.asarray(o) for o in out)
            print(f"{name}: {dt*1e3/B:7.3f} ms/frame  "
                  f"({dt*1e3:.1f} ms/batch, compile {compile_s:.1f}s)",
                  flush=True)

    base = outs["ss=bin  pack=0"]
    for name, o in outs.items():
        same = all(np.array_equal(a, b) for a, b in zip(base, o))
        print(f"bit-identical[{name}]: {same}", flush=True)


if __name__ == "__main__":
    main()
