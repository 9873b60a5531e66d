"""Pallas DBSCAN kernel: the whole per-frame clustering stays in VMEM.

The jnp path (ops/dbscan.py) materializes, per convergence sweep, ~50 rolled
copies of the label image plus two tuple-carry ``associative_scan`` floods in
HBM — measured 1.38 s/batch-64 on the 64E grid (46 fps device-only), with the
pointer-jump ``shortcut`` alone costing 110 ms/batch of serialized gathers.

This kernel loads the three coordinate planes + active mask once per frame
(~1.6 MB, far inside the ~16 MB VMEM budget) and then:

1. packs the 48-shift eps-connectivity graph into two u32 bitplanes
   (vs a (48, H, W) bool stack in HBM), deriving core pixels
   (``utils/segment_utils.py:149-164`` semantics via ops/dbscan.py);
2. runs the connected-components loop as an in-kernel ``while_loop`` —
   masked window-min hook over the 48 edge shifts + forward/backward
   *segmented doubling* floods along rows and columns (log2(W)+log2(H)
   masked min-shift steps replace the associative scans; no gathers
   anywhere) — each frame exits as soon as its own labels converge;
3. attaches border pixels to their min-labeled core eps-neighbor and
   writes the final label image.

Per-frame HBM traffic is 4 plane reads + 1 label write (~2 MB) instead of
~100 MB of materialized intermediates; discovery-order compaction (a single
rank gather) stays in XLA.  Semantics are element-identical to
``dbscan_range_image`` (ops/dbscan.py) — pinned by tests/test_dbscan_pallas.py
in interpret mode and by the on-device seg-map equality check used before
wiring it in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpcc_tpu.ops.dbscan import MIN_POINTS, WINDOW, _neighbor_shifts


def _dbscan_label_kernel(
    eps2: float,
    min_points: int,
    window: int,
    px_ref,
    py_ref,
    pz_ref,
    act_ref,
    out_ref,
):
    H, W = out_ref.shape[1], out_ref.shape[2]
    hw = H * W
    shifts = _neighbor_shifts(window)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def roll(x, s, axis, size):
        # pltpu.roll wants s >= 0; circular, so -s == size - s.  Mosaic
        # only rotates 32-bit lanes — widen bools through int32.
        s %= size
        if s == 0:
            return x
        if x.dtype == jnp.bool_:
            return pltpu.roll(x.astype(jnp.int32), s, axis) != 0
        return pltpu.roll(x, s, axis)

    def shift2(x, dr, dc, fill):
        """Value of the (r+dr, c+dc) neighbor at (r, c): column-circular,
        row-clamped with ``fill`` — mirrors ops/dbscan.py::_shift.

        Bool inputs run widened to int32: Mosaic cannot select into an i1
        vector (bools store as i8; the i8->i1 trunc is unsupported)."""
        isbool = x.dtype == jnp.bool_
        if isbool:
            x = x.astype(jnp.int32)
            fill = jnp.int32(bool(fill))
        out = x
        if dc != 0:
            out = roll(out, -dc, 1, W)
        if dr != 0:
            out = roll(out, -dr, 0, H)
            if dr > 0:
                out = jnp.where(rows_i >= H - dr, fill, out)
            else:
                out = jnp.where(rows_i < -dr, fill, out)
        return out != 0 if isbool else out

    px = px_ref[0]
    py = py_ref[0]
    pz = pz_ref[0]
    act = act_ref[0] != 0

    # ---- pass 1: eps-connectivity bits + neighbor counts -> core pixels
    one = jnp.uint32(1)
    nlo = jnp.zeros((H, W), jnp.uint32)
    nhi = jnp.zeros((H, W), jnp.uint32)
    ncount = jnp.zeros((H, W), jnp.int32)
    for i, (dr, dc) in enumerate(shifts):
        nb_act = shift2(act, dr, dc, False)
        dx = px - shift2(px, dr, dc, jnp.inf)
        dy = py - shift2(py, dr, dc, 0.0)
        dz = pz - shift2(pz, dr, dc, 0.0)
        d2 = dx * dx + dy * dy + dz * dz
        conn = act & nb_act & (d2 < eps2)
        ncount = ncount + conn.astype(jnp.int32)
        bit = jnp.where(conn, one, jnp.uint32(0))
        if i < 32:
            nlo = nlo | (bit << i)
        else:
            nhi = nhi | (bit << (i - 32))
    core = act & (ncount + 1 >= min_points)

    def conn_bit(i):
        if i < 32:
            return (nlo >> i) & one != 0
        return (nhi >> (i - 32)) & one != 0

    # ---- pass 2: core-core edge bits + border-candidate bits
    celo = jnp.zeros((H, W), jnp.uint32)
    cehi = jnp.zeros((H, W), jnp.uint32)
    blo = jnp.zeros((H, W), jnp.uint32)
    bhi = jnp.zeros((H, W), jnp.uint32)
    for i, (dr, dc) in enumerate(shifts):
        nb_core = shift2(core, dr, dc, False)
        ci = conn_bit(i)
        ce = jnp.where(ci & core & nb_core, one, jnp.uint32(0))
        bm = jnp.where(ci & nb_core, one, jnp.uint32(0))
        if i < 32:
            celo = celo | (ce << i)
            blo = blo | (bm << i)
        else:
            cehi = cehi | (ce << (i - 32))
            bhi = bhi | (bm << (i - 32))

    def edge_bit(i):
        if i < 32:
            return (celo >> i) & one != 0
        return (cehi >> (i - 32)) & one != 0

    # Run links for the segmented floods (non-circular, like the jnp path).
    i01 = shifts.index((0, 1))
    i10 = shifts.index((1, 0))
    e01 = edge_bit(i01)
    e10 = edge_bit(i10)
    lp_col = (cols_i > 0) & roll(e01, 1, 1, W)  # (r,c) linked to (r,c-1)
    lp_row = shift2(e10, -1, 0, False)  # (r,c) linked to (r-1,c)

    def flood(v, lp, axis, size):
        """Min label over maximal linked runs along ``axis``: forward +
        backward segmented doubling (Hillis-Steele), gather-free.  The
        reach masks stay int32 (see shift2 on why not bool)."""

        def shift_in(x, d, fill):
            out = roll(x, d, axis, size)
            idx = rows_i if axis == 0 else cols_i
            return jnp.where(idx < d, fill, out)

        def shift_bk(x, d, fill):
            out = roll(x, -d, axis, size)
            idx = rows_i if axis == 0 else cols_i
            return jnp.where(idx >= size - d, fill, out)

        f = v
        reach = lp.astype(jnp.int32)
        d = 1
        while d < size:
            f = jnp.where(reach != 0, jnp.minimum(f, shift_in(f, d, hw)), f)
            reach = reach & shift_in(reach, d, 0)
            d *= 2
        ln = shift_bk(lp.astype(jnp.int32), 1, 0)  # (., i) linked to (., i+1)
        b = v
        reach = ln
        d = 1
        while d < size:
            b = jnp.where(reach != 0, jnp.minimum(b, shift_bk(b, d, hw)), b)
            reach = reach & shift_bk(reach, d, 0)
            d *= 2
        return jnp.minimum(f, b)

    # ---- connected components: hook + floods until stable
    flat_iota = rows_i * W + cols_i
    labels0 = jnp.where(core, flat_iota, hw)

    def sweep(lab):
        best = lab
        for i, (dr, dc) in enumerate(shifts):
            nb = shift2(lab, dr, dc, hw)
            best = jnp.where(edge_bit(i), jnp.minimum(best, nb), best)
        best = flood(best, lp_col, 1, W)
        return flood(best, lp_row, 0, H)

    def body(state):
        lab, _ = state
        new = sweep(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.any(core))
    )

    # ---- border attachment: min-labeled core eps-neighbor
    border = jnp.full((H, W), hw, jnp.int32)
    for i, (dr, dc) in enumerate(shifts):
        nb_lab = shift2(labels, dr, dc, hw)
        if i < 32:
            bb = (blo >> i) & one != 0
        else:
            bb = (bhi >> (i - 32)) & one != 0
        border = jnp.where(bb, jnp.minimum(border, nb_lab), border)
    labels = jnp.where(core, labels, jnp.where(act, border, hw))
    out_ref[0] = labels


@functools.partial(
    jax.jit, static_argnames=("eps", "min_points", "window", "interpret")
)
def dbscan_labels_pallas(
    point_planes: jnp.ndarray,  # (3, H, W) planar x/y/z
    active: jnp.ndarray,  # (H, W) bool
    eps: float,
    min_points: int = MIN_POINTS,
    window: int = WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw component labels (root pixel index; hw = unlabeled), one frame.

    Element-identical to the pre-compaction labels of
    ``ops/dbscan.py::dbscan_range_image`` — the caller applies the same
    discovery-order compaction.
    """
    H, W = active.shape
    px, py, pz = point_planes[0], point_planes[1], point_planes[2]
    spec = pl.BlockSpec((1, H, W), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _dbscan_label_kernel, float(eps) * float(eps), min_points, window
        ),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.int32),
        # ~70 live (H, W) i32 planes across the unrolled hook/flood bodies;
        # the 16M default scoped-vmem stack is too small on the 64x2000 grid.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(px[None], py[None], pz[None], active[None].astype(jnp.int32))[0]
