"""Spherical projection: point cloud <-> range image.

TPU-native replacement for the reference's C++ projection kernel
(``cpp_modules.cpp:427-467``, exposed as
``dataset_utils_cpp.point_cloud_to_range_image_even``) and the trig-table
builder (``dataset/transformer.py:41-54``).

Design:
  * The forward projection is a **scatter-min** over ``row * W + col`` — the
    data-parallel equivalent of the reference's sequential keep-nearest loop
    (``cpp_modules.cpp:459-460``: keep the smaller depth; first writer wins on
    exact ties, which scatter-min reproduces since equal values are
    indistinguishable).
  * Padding points (``depth == 0``) scatter ``+inf`` so fixed-shape batches of
    variable-size clouds are safe; empty pixels decode to depth 0.
  * The inverse is one broadcast multiply with the precomputed unit-ray
    ``transform_map`` (``dataset/transformer.py:94-101``).
  * Angle binning uses C ``round`` semantics (round half away from zero) and
    the same 2*3.14159265 wrap constant as the C++ kernel so pixel assignment
    agrees bit-for-bit in float32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from rpcc_tpu.config import LidarConfig
from rpcc_tpu.ops.rounding import round_half_away

# The C++ kernel wraps azimuth with the literal 2*3.14159265
# (cpp_modules.cpp:449); keep the same constant for binning parity.
_TWO_PI_REF = 2.0 * 3.14159265


def build_transform_map(lidar: LidarConfig) -> np.ndarray:
    """Precompute the (H, W, 3) unit-ray table: ``point = depth * ray``.

    Row h's altitude is evenly spaced over the vertical FOV (or taken from the
    per-channel table for uneven LiDARs); column w's azimuth spans the
    horizontal FOV.  Computed in float64 then cast, matching the reference.
    """
    H, W = lidar.height, lidar.width
    if lidar.even_dist:
        vfov = lidar.vertical_max - lidar.vertical_min
        altitude = vfov * (np.arange(H) / (H - 1)) + lidar.vertical_min
    else:
        altitude = np.radians(np.asarray(lidar.vertical_angles_deg, dtype=np.float64))
        assert altitude.shape[0] == H, "channel table must have H entries"
    azimuth = lidar.horizontal_fov * (np.arange(W) / W)
    cos_alt = np.cos(altitude)[:, None]
    tm = np.stack(
        [
            cos_alt * np.cos(azimuth)[None, :],
            cos_alt * np.sin(azimuth)[None, :],
            np.broadcast_to(np.sin(altitude)[:, None], (H, W)),
        ],
        axis=-1,
    )
    return tm.astype(np.float32)


def build_transform_planes(lidar: LidarConfig) -> np.ndarray:
    """(3, H, W) planar unit-ray table.

    Planar (structure-of-arrays) is the TPU-native layout: a trailing dim of
    3 would be tile-padded to 128 lanes, costing ~42x the bandwidth in every
    elementwise op that touches it.
    """
    return np.transpose(build_transform_map(lidar), (2, 0, 1)).copy()


def project_points(
    points: jnp.ndarray,
    lidar: LidarConfig,
    vertical_angles: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Project an (N, 3) float32 cloud to an (H, W) range image.

    Invalid/padding points must have ``depth == 0`` (e.g. all-zero rows); they
    never win the scatter-min.  For uneven-channel LiDARs pass the per-row
    angle table (radians) as ``vertical_angles``; rows are then assigned by
    nearest channel angle (``dataset/transformer.py:82-83``) and columns by
    round-half-even, mirroring the reference's numpy path.
    """
    H, W = lidar.height, lidar.width
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    depth = jnp.sqrt(x * x + y * y + z * z)
    az = jnp.arctan2(y, x)
    az = jnp.where(az < 0, az + _TWO_PI_REF, az)

    if lidar.even_dist:
        col = round_half_away(az / lidar.horizontal_fov * W).astype(jnp.int32) % W
        v_ang = jnp.arctan2(z, jnp.sqrt(x * x + y * y))
        vres = (lidar.vertical_max - lidar.vertical_min) / (H - 1)
        row = round_half_away((v_ang - lidar.vertical_min) / vres).astype(jnp.int32)
        row = jnp.clip(row, 0, H - 1)
    else:
        # np.rint (half-even) + nearest-channel row (transformer.py:73-83).
        col = jnp.round(az / lidar.horizontal_fov * W).astype(jnp.int32) % W
        v_ang = jnp.arctan2(z, jnp.sqrt(x * x + y * y))
        diff = jnp.abs(vertical_angles[None, :] - v_ang[:, None])  # (N, H)
        row = jnp.argmin(diff, axis=-1).astype(jnp.int32)

    valid = depth > 0.0
    flat_idx = row * W + col
    return _scatter_min_image(flat_idx, depth, valid, H, W)


def _scatter_min_image(
    flat_idx: jnp.ndarray, depth: jnp.ndarray, valid: jnp.ndarray, H: int, W: int
) -> jnp.ndarray:
    """Keep-nearest rasterization without an XLA scatter.

    A scatter-min over the pixel grid crawls the TPU scalar core (~8.6ns per
    index, half the encoder's device time); instead, sort (pixel_key, depth)
    over the points plus one +inf filler per pixel — each pixel's run head is
    then its min depth (first point wins exact ties, matching the C++
    keep-nearest loop, cpp_modules.cpp:459-460), head ranks are exactly pixel
    ids, and one stable compaction sort lays the heads out in pixel order.
    """
    hw = H * W
    key_pts = jnp.where(valid, flat_idx, hw).astype(jnp.int32)
    keys = jnp.concatenate([key_pts, jnp.arange(hw, dtype=jnp.int32)])
    depths = jnp.concatenate(
        [jnp.where(valid, depth, jnp.inf), jnp.full((hw,), jnp.inf, jnp.float32)]
    )
    # Unstable is safe here: both operands are sort keys, so ties are fully
    # identical (key, depth) pairs — and it drops the index augmentation XLA
    # adds for stability (measured -6.2ms of the B=32 batch on TPU).
    k1, d1 = jax.lax.sort((keys, depths), num_keys=2, is_stable=False)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), k1[:-1]])
    head = (k1 != prev).astype(jnp.int32)
    # Compaction sort #2: heads must land at positions 0..hw-1 in PIXEL
    # order.  Head keys are exactly the distinct pixel ids, so packing
    # (1-head, pixel) into one i32 makes the key total order unique wherever
    # it matters — an UNSTABLE single-key sort then needs no iota
    # augmentation (non-head duplicates may permute freely; they're sliced
    # off).  hw < 2^30 always holds for range-image grids.
    shift = max(int(hw).bit_length(), 1)
    packed = ((1 - head) << shift) | k1
    _, dheads = jax.lax.sort((packed, d1), num_keys=1, is_stable=False)
    ri = dheads[:hw]
    ri = jnp.where(jnp.isinf(ri), 0.0, ri)
    return ri.reshape(H, W)


def range_image_to_points(range_image: jnp.ndarray, transform_map: jnp.ndarray) -> jnp.ndarray:
    """(.., H, W) range image -> (.., H, W, 3) points: one broadcast multiply."""
    return range_image[..., None] * transform_map


# --------------------------------------------------------- host projection
# The production pipelines project on the HOST and upload the (H, W) range
# image: 3x fewer bytes over PCIe/ICI than the raw (N, 3) cloud, no device
# compaction sorts (which were ~44% of the device encode), and bitstreams
# become backend-independent (numpy binning instead of per-backend
# transcendental ulps).  This mirrors the reference architecture — its
# projection is a host C++ kernel too (cpp_modules.cpp:427-467).  The
# in-graph ``project_points`` above remains for pure-device pipelines.


def _round_half_away_np(x: np.ndarray) -> np.ndarray:
    """numpy twin of ops/rounding.py::round_half_away (C ``round()``)."""
    return np.trunc(x + np.where(x >= 0, np.float32(0.5), np.float32(-0.5)))


# Deterministic atan2: numpy's own f32/f64 arctan2 kernels do NOT match libm
# (155/2000 f64 ulp diffs measured), so a C++ twin of the binning could flip
# range-image bins vs this fallback.  Instead both paths evaluate the SAME
# +,-,*,/ sequence (each IEEE-exact-rounded, hence bit-identical): octant
# reduction + odd Chebyshev-fit polynomial, 5.3e-15 max f64 error — and the
# result is cast to f32, where it matched np.arctan2 on 10^6 random samples
# with zero mismatches.  Mirror of project_bin_raster in codec/native/
# raster.cpp — keep the coefficient lists in sync.
_ATAN_W8 = 0.41421356237309503  # tan(pi/8)
_ATAN_COEFFS = (
    0.999999999999762,
    -0.3333333332494847,
    0.19999999129892043,
    -0.14285673103306398,
    0.11110049848756427,
    -0.09074709961180911,
    0.07540656567851425,
    -0.05797933104322553,
    0.02961455500835997,
)


def _atan2_det(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Deterministic float64 atan2 (see _ATAN_COEFFS note)."""
    ay, ax = np.abs(y), np.abs(x)
    swap = ay > ax
    num = np.where(swap, ax, ay)
    den = np.where(swap, ay, ax)
    t = num / np.where(den == 0, 1.0, den)
    red = t > _ATAN_W8
    u = np.where(red, (t - 1.0) / (t + 1.0), t)
    u2 = u * u
    p = np.full_like(u, _ATAN_COEFFS[8])
    for cj in _ATAN_COEFFS[7::-1]:
        p = p * u2 + cj
    a = u * p + np.where(red, np.pi / 4, 0.0)
    a = np.where(swap, np.pi / 2 - a, a)
    a = np.where(x < 0, np.pi - a, a)
    a = np.where(y < 0, -a, a)
    return np.where(den == 0, 0.0, a)


def bin_points_host(points: np.ndarray, lidar: LidarConfig):
    """(N, >=3) cloud -> (depth (N,) f32, flat pixel index (N,) i32).

    Angles/depth are computed in float64 with the deterministic kernels
    above and cast to f32; binning math is f32 with the same formulas/
    constants as ``project_points`` (C ``round`` half-away binning,
    reference 2*3.14159265 wrap, nearest-channel rows for uneven LiDARs).
    Bit-identical to the native C++ fused kernel.  Padding rows (all-zero)
    get depth 0.
    """
    pts = np.asarray(points, np.float32)
    x64 = pts[:, 0].astype(np.float64)
    y64 = pts[:, 1].astype(np.float64)
    z64 = pts[:, 2].astype(np.float64)
    xx = x64 * x64
    h2 = xx + y64 * y64
    d2 = h2 + z64 * z64
    depth = np.sqrt(d2).astype(np.float32)
    az = _atan2_det(y64, x64).astype(np.float32)
    az = np.where(az < 0, az + np.float32(_TWO_PI_REF), az)
    H, W = lidar.height, lidar.width
    v_ang = _atan2_det(z64, np.sqrt(h2)).astype(np.float32)
    if lidar.even_dist:
        col = _round_half_away_np(
            az / np.float32(lidar.horizontal_fov) * np.float32(W)
        ).astype(np.int32) % W
        # One f64->f32 cast AFTER the python-float division, matching the
        # device graph's weak-type promotion of the closed-over scalar.
        vres = np.float32((lidar.vertical_max - lidar.vertical_min) / (H - 1))
        row = _round_half_away_np(
            (v_ang - np.float32(lidar.vertical_min)) / vres
        ).astype(np.int32)
        row = np.clip(row, 0, H - 1)
    else:
        # np.rint (half-even) + nearest-channel row (transformer.py:73-83).
        col = np.rint(az / np.float32(lidar.horizontal_fov) * np.float32(W)).astype(np.int32) % W
        va = np.radians(np.asarray(lidar.vertical_angles_deg, np.float64)).astype(np.float32)
        row = np.argmin(np.abs(va[None, :] - v_ang[:, None]), axis=-1).astype(np.int32)
    return depth, (row * np.int32(W) + col).astype(np.int32)


def raster_range_image_host(depth: np.ndarray, flat_idx: np.ndarray, H: int, W: int) -> np.ndarray:
    """Keep-nearest scatter-min on host -> (H, W) f32 range image.

    Native C++ loop when available (codec/native/raster.cpp, ~0.3 ms/frame);
    numpy fallback: stable-ascending depth sort reversed, so the last fancy-
    index write per pixel is the nearest point, and among exact depth ties
    the FIRST point in input order wins — identical to the C++/device paths.
    """
    from rpcc_tpu.codec.lz4block import native_lib

    ri = np.zeros(H * W, np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    flat_idx = np.ascontiguousarray(flat_idx, np.int32)
    lib = native_lib()
    if lib is not None and hasattr(lib, "raster_scatter_min"):
        import ctypes as ct

        lib.raster_scatter_min(
            depth.ctypes.data_as(ct.c_void_p),
            flat_idx.ctypes.data_as(ct.c_void_p),
            ct.c_int64(depth.shape[0]),
            ri.ctypes.data_as(ct.c_void_p),
            ct.c_int64(H * W),
        )
    else:
        o = np.argsort(depth, kind="stable")[::-1]
        d = depth[o]
        k = flat_idx[o]
        live = d > 0
        ri[k[live]] = d[live]
    return ri.reshape(H, W)


def _native_proj_head(points: np.ndarray, lidar: LidarConfig):
    """Validate + marshal the shared head of every native projection call:
    ``-> (pts, va, head)`` where ``head`` is the common leading argument
    tuple ``(pts_ptr, n, stride, H, W, even, hfov, vmin, vres, va_ptr,
    n_chan)``.  ``pts``/``va`` are returned so callers keep the backing
    buffers alive across the call.  c_float wrappers are required: untyped
    ctypes calls promote python floats to double and corrupt the ABI
    (argtypes are also registered in lz4block._load for the same reason).
    The f64->f32 vres cast is part of the binning-parity contract with the
    numpy fallback — change it in exactly one place (here)."""
    import ctypes as ct

    H, W = lidar.height, lidar.width
    pts = np.asarray(points, np.float32)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError(f"points must be (N, >=3), got {pts.shape}")
    if pts.strides[1] != 4:
        pts = np.ascontiguousarray(pts[:, :3], np.float32)
    stride = pts.strides[0] // 4
    if lidar.even_dist:
        vres = np.float32((lidar.vertical_max - lidar.vertical_min) / (H - 1))
        va, va_ptr, n_chan = None, None, 0
    else:
        vres = np.float32(0.0)
        va = np.radians(
            np.asarray(lidar.vertical_angles_deg, np.float64)
        ).astype(np.float32)
        va = np.ascontiguousarray(va)
        va_ptr, n_chan = va.ctypes.data_as(ct.c_void_p), int(va.shape[0])
    head = (
        pts.ctypes.data_as(ct.c_void_p),
        ct.c_int64(pts.shape[0]),
        ct.c_int64(stride),
        ct.c_int32(H),
        ct.c_int32(W),
        ct.c_int32(1 if lidar.even_dist else 0),
        ct.c_float(np.float32(lidar.horizontal_fov)),
        ct.c_float(np.float32(lidar.vertical_min)),
        ct.c_float(vres),
        va_ptr,
        ct.c_int32(n_chan),
    )
    return pts, va, head


def project_points_host(points: np.ndarray, lidar: LidarConfig) -> np.ndarray:
    """Host twin of ``project_points``: (N, >=3) cloud -> (H, W) range image.

    One fused native pass (bin + scatter-min, ~0.5 ms/frame) when the C++
    library is available; bit-identical two-pass numpy fallback otherwise.
    """
    from rpcc_tpu.codec.lz4block import native_lib

    H, W = lidar.height, lidar.width
    lib = native_lib()
    if lib is not None and hasattr(lib, "project_bin_raster"):
        import ctypes as ct

        pts, _va, head = _native_proj_head(points, lidar)
        ri = np.zeros(H * W, np.float32)
        lib.project_bin_raster(*head, ri.ctypes.data_as(ct.c_void_p))
        return ri.reshape(H, W)

    depth, flat_idx = bin_points_host(points, lidar)
    return raster_range_image_host(depth, flat_idx, H, W)


def project_points_host_u16(points: np.ndarray, lidar: LidarConfig, step_over16: float):
    """u16 transfer projection: -> ((H, W) u16 snapped depths, f32 delta).

    delta = max(step_over16, depth_max/65535); depths are rint(ri/delta)
    clamped to 65535 (never truncates — delta >= depth_max/65535 by choice).
    Fused native single pass when available; numpy fallback is bit-identical
    (same f64 max math, f32 reciprocal multiply, rint, clamp).
    """
    from rpcc_tpu.codec.lz4block import native_lib

    H, W = lidar.height, lidar.width
    floor = np.float32(step_over16)
    lib = native_lib()
    if lib is not None and hasattr(lib, "project_bin_raster_u16"):
        import ctypes as ct

        pts, _va, head = _native_proj_head(points, lidar)
        scratch = np.zeros(H * W, np.float32)
        out = np.empty(H * W, np.uint16)
        delta = np.zeros(1, np.float32)
        lib.project_bin_raster_u16(
            *head,
            ct.c_float(floor),
            scratch.ctypes.data_as(ct.c_void_p),
            out.ctypes.data_as(ct.c_void_p),
            delta.ctypes.data_as(ct.c_void_p),
        )
        return out.reshape(H, W), np.float32(delta[0])

    ri = project_points_host(points, lidar)
    d = np.float32(max(float(floor), float(ri.max()) / 65535.0))
    q = np.rint(ri * (np.float32(1.0) / d))
    return np.minimum(q, np.float32(65535.0)).astype(np.uint16), d


def project_points_host_d8(points: np.ndarray, lidar: LidarConfig, step_over16: float):
    """i8 row-delta transfer projection:
    ``-> ((H, W) i8 delta plane, (n,) u16 exc pos-deltas, (n,) u16 exc
    values, f32 delta)``.

    Same u16 snap grid as :func:`project_points_host_u16`, but the wire
    carries first-differences of the flattened q grid as i8 plus a compact
    exception list (column 0 of every row, and any |delta| > 127 — ~7-12k
    entries on KITTI).  ~30% fewer uplink bytes than raw u16; the encoder
    graph reconstructs q exactly with two cumsums + one small scatter
    (``ri_d8`` mode), so the bitstream is bit-identical to u16-transfer
    mode.  Exception position deltas never overflow u16: the col-0 resets
    bound the gap by W.  Native single pass when available; the numpy
    fallback applies the identical rule to the identical q grid.
    """
    from rpcc_tpu.codec.lz4block import native_lib

    H, W = lidar.height, lidar.width
    hw = H * W
    floor = np.float32(step_over16)
    lib = native_lib()
    if lib is not None and hasattr(lib, "project_bin_raster_d8"):
        import ctypes as ct

        pts, _va, head = _native_proj_head(points, lidar)
        scratch = np.zeros(hw, np.float32)
        q_scratch = np.empty(hw, np.uint16)
        delta = np.zeros(1, np.float32)
        d8 = np.empty(hw, np.int8)
        exc_pd = np.empty(hw, np.uint16)
        exc_val = np.empty(hw, np.uint16)
        n_exc = lib.project_bin_raster_d8(
            *head,
            ct.c_float(floor),
            scratch.ctypes.data_as(ct.c_void_p),
            q_scratch.ctypes.data_as(ct.c_void_p),
            delta.ctypes.data_as(ct.c_void_p),
            d8.ctypes.data_as(ct.c_void_p),
            exc_pd.ctypes.data_as(ct.c_void_p),
            exc_val.ctypes.data_as(ct.c_void_p),
        )
        return (
            d8.reshape(H, W),
            exc_pd[:n_exc].copy(),
            exc_val[:n_exc].copy(),
            np.float32(delta[0]),
        )

    q, d = project_points_host_u16(points, lidar, step_over16)
    qi = q.astype(np.int32).reshape(-1)
    diff = np.diff(qi, prepend=np.int32(0))
    col0 = (np.arange(hw) % W) == 0
    exc = col0 | (diff < -128) | (diff > 127)
    d8 = np.where(exc, 0, diff).astype(np.int8)
    pos = np.flatnonzero(exc)
    pd = np.diff(pos, prepend=np.int64(-1)).astype(np.uint16)
    val = qi[pos].astype(np.uint16)
    return d8.reshape(H, W), pd, val, np.float32(d)


def project_points_host_m8(points: np.ndarray, lidar: LidarConfig, step_over16: float):
    """Masked-compact i8 delta transfer projection:
    ``-> ((ceil(H*W/8),) u8 packed nonzero mask, (n_nz,) i8 compact deltas,
    (n_exc,) u16 exc pos-deltas, (n_exc,) u16 exc values, n_nz, f32 delta)``.

    Same u16 snap grid as :func:`project_points_host_u16`, but the wire
    drops the zero pixels entirely: a 1-bit occupancy plane (16 KB on 64E)
    plus first-differences over *consecutive nonzero* pixels as i8.  The
    zero<->depth transitions that dominate the full-plane delta tails
    vanish, so the exception list shrinks ~12k -> ~3.5k on KITTI and the
    wire drops ~27% vs the ``'i8'`` mode (~176 -> ~128 KB/frame jittered).
    Exceptions are the first nonzero pixel of each row (reset, bounding
    exception pos-gaps by W in the compact domain, so u16 pos-deltas never
    overflow) and any compact delta outside i8 range.  The encoder graph
    (``ri_m8`` mode) reconstructs the exact q grid with the same
    two-cumsum + small-scatter inversion as ``ri_d8`` in the compact
    domain, then one rank-indexed gather expands it through the mask —
    bitstream stays bit-identical to u16-transfer mode.
    """
    H, W = lidar.height, lidar.width
    from rpcc_tpu.codec.lz4block import native_lib

    lib = native_lib()
    hw = H * W
    if lib is not None and hasattr(lib, "project_bin_raster_m8") and hw % 8 == 0:
        import ctypes as ct

        pts, _va, head = _native_proj_head(points, lidar)
        scratch = np.zeros(hw, np.float32)
        q_scratch = np.empty(hw, np.uint16)
        delta = np.zeros(1, np.float32)
        maskp = np.empty(hw // 8, np.uint8)
        d8c = np.empty(hw, np.int8)
        epd = np.empty(hw, np.uint16)
        eval_ = np.empty(hw, np.uint16)
        n_nz = np.zeros(1, np.int64)
        n_exc = lib.project_bin_raster_m8(
            *head,
            ct.c_float(np.float32(step_over16)),
            scratch.ctypes.data_as(ct.c_void_p),
            q_scratch.ctypes.data_as(ct.c_void_p),
            delta.ctypes.data_as(ct.c_void_p),
            maskp.ctypes.data_as(ct.c_void_p),
            d8c.ctypes.data_as(ct.c_void_p),
            epd.ctypes.data_as(ct.c_void_p),
            eval_.ctypes.data_as(ct.c_void_p),
            n_nz.ctypes.data_as(ct.c_void_p),
        )
        nn = int(n_nz[0])
        return (
            maskp,
            d8c[:nn].copy(),
            epd[:n_exc].copy(),
            eval_[:n_exc].copy(),
            nn,
            np.float32(delta[0]),
        )
    q, d = project_points_host_u16(points, lidar, step_over16)
    qi = q.astype(np.int32).reshape(-1)
    mask = qi != 0
    maskp = np.packbits(mask)  # MSB-first, zero-padded to a byte boundary
    nzpos = np.flatnonzero(mask)
    nzq = qi[nzpos]
    n = nzq.size
    if n == 0:
        empty16 = np.empty((0,), np.uint16)
        return maskp, np.empty((0,), np.int8), empty16, empty16, 0, np.float32(d)
    rows = nzpos // W
    diff = np.diff(nzq, prepend=np.int32(0))
    reset = np.empty(n, np.bool_)
    reset[0] = True
    np.not_equal(rows[1:], rows[:-1], out=reset[1:])
    exc = reset | (diff < -128) | (diff > 127)
    d8c = np.where(exc, 0, diff).astype(np.int8)
    pos = np.flatnonzero(exc)
    pd = np.diff(pos, prepend=np.int64(-1)).astype(np.uint16)
    val = nzq[pos].astype(np.uint16)
    return maskp, d8c, pd, val, n, np.float32(d)
