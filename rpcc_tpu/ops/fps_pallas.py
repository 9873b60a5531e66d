"""Pallas FPS kernel: the running min-distance vector stays in VMEM.

The ``lax.fori_loop`` FPS (ops/fps.py) re-reads the coordinate planes from
HBM on every one of the K-1 sequential selections.  This kernel loads the
planes into VMEM once per frame (3 x N x 4B ~ 1.5MB for a 64E grid, well
inside the ~16MB budget), keeps the running min-d2 in VMEM scratch, and runs
the selection loop entirely on-chip; the grid maps one program per frame so
a batch fills the chip.

Data is shaped (N/128, 128) so VPU tiles are fully utilized (a (1, N) or
(N,) layout would pad 8x in the sublane dimension).  Argmax is two-step
(row max -> row argmax -> column argmax) which preserves the reference
CUDA op's lowest-index-wins tie rule in row-major order.

Semantics identical to the reference CUDA op (seed 0); validated against the
lax version in tests (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fps_kernel(num_samples: int, xs_ref, ys_ref, zs_ref, out_ref, mind2_ref):
    rows = xs_ref.shape[1]
    b = pl.program_id(0)  # out block spans the full (B, K) array; the TPU
    # grid is sequential, so each program owns its row.

    out_ref[b, 0] = 0  # seed at index 0 (sampling_gpu.cu:43-46); out in SMEM
    mind2_ref[:, :] = jnp.full((rows, LANES), 1e10, dtype=jnp.float32)

    # Mosaic has no dynamic_slice: the selected point's coordinates are
    # extracted with masked reductions, and argmax is a masked index-min —
    # everything stays pure vector ops over the VMEM-resident planes.
    flat_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )

    def body(i, last):
        sel = flat_iota == last
        x0 = jnp.sum(jnp.where(sel, xs_ref[0, :, :], 0.0))
        y0 = jnp.sum(jnp.where(sel, ys_ref[0, :, :], 0.0))
        z0 = jnp.sum(jnp.where(sel, zs_ref[0, :, :], 0.0))
        dx = xs_ref[0, :, :] - x0
        dy = ys_ref[0, :, :] - y0
        dz = zs_ref[0, :, :] - z0
        d2 = dx * dx + dy * dy + dz * dz
        mind2 = jnp.minimum(mind2_ref[:, :], d2)
        mind2_ref[:, :] = mind2
        maxv = jnp.max(mind2)
        # first occurrence in row-major order = min flat index among maxima
        nxt = jnp.min(jnp.where(mind2 == maxv, flat_iota, rows * LANES)).astype(jnp.int32)
        out_ref[b, i] = nxt  # scalar store -> SMEM output
        return nxt

    jax.lax.fori_loop(1, num_samples, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sample_pallas(
    xs: jnp.ndarray,  # (B, N) or (N,), N % 128 == 0
    ys: jnp.ndarray,
    zs: jnp.ndarray,
    num_samples: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched Pallas FPS; returns (B, num_samples) (or (num_samples,))."""
    squeeze = xs.ndim == 1
    if squeeze:
        xs, ys, zs = xs[None], ys[None], zs[None]
    B, n = xs.shape
    assert n % LANES == 0, "point count must be a multiple of 128"
    rows = n // LANES
    x2 = xs.reshape(B, rows, LANES)
    y2 = ys.reshape(B, rows, LANES)
    z2 = zs.reshape(B, rows, LANES)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, num_samples), lambda b: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_samples), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.float32)],
        interpret=interpret,
    )(x2, y2, z2)
    return out[0] if squeeze else out
