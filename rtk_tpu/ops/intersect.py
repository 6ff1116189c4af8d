"""Watertight ray/triangle intersection and ray/AABB slab tests (batched).

Semantics follow the reference exactly (studied, not copied):
  * shear basis: z = first axis attaining max |dir| component (x, then y,
    then z priority), x/y cyclic (rtk.c:550-556);
  * shear constants -dx/dz, -dy/dz, 1/dz with exact division (rtk.c:561-563,
    RTK_MM_RCP is a true divide, rtk.c:162);
  * 2D shear-space edge functions u, v, w; a hit requires all three to share
    a sign (zero allowed on either side), rtk.c:298-344;
  * exact-zero edge functions are recomputed at higher precision to make the
    test watertight (rtk.c:294-336 uses f64; on TPU we use double-word f32
    products, ~2^-48 relative error, selectable);
  * t = (u*z0 + v*z1 + w*z2) / det, accepted iff min_t < t < cur_t — an open
    interval with a strict nearest-hit compare (rtk.c:346-371);
  * returned u, v are u/det, v/det: barycentric weights of vertices 0 and 1.

Slab test folds the three child-AABB conditions into
max(near, ray_min_t) <= min(far, cur_hit_t) like rtk.c:449-473, using
NaN-suppressing min/max so rays with zero direction components stay robust.

All functions broadcast over arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

# Host-side scalar: module-level jnp constants are device-resident and
# force tunnel syncs when captured by traced functions.
F32_INF = np.float32(np.inf)


class ShearBasis(struct.PyTreeNode):
    """Per-ray shear-space basis (parity: _rtk_trace setup, rtk.c:550-567)."""

    kx: Array  # (...,) i32 axis indices
    ky: Array
    kz: Array
    sx: Array  # (...,) f32 shear constants
    sy: Array
    sz: Array


def ray_shear(direction: Array) -> ShearBasis:
    """Compute the shear basis for each ray direction (..., 3)."""
    d = jnp.asarray(direction, jnp.float32)
    ad = jnp.abs(d)
    maxc = jnp.max(ad, axis=-1)
    # First axis attaining the max: x, then y, then z (rtk.c:553).
    kz = jnp.where(
        ad[..., 0] == maxc,
        0,
        jnp.where(ad[..., 1] == maxc, 1, 2),
    ).astype(jnp.int32)
    kx = jnp.remainder(kz + 1, 3)
    ky = jnp.remainder(kz + 2, 3)
    take = lambda idx: jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]
    dx, dy, dz = take(kx), take(ky), take(kz)
    return ShearBasis(
        kx=kx,
        ky=ky,
        kz=kz,
        sx=-dx / dz,
        sy=-dy / dz,
        sz=jnp.float32(1.0) / dz,
    )


def _split(a: Array):
    """Veltkamp split of f32 into high/low halves (no FMA required)."""
    c = jnp.float32(4097.0) * a  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a: Array, b: Array):
    """Exact product a*b = p + e in double-word f32 arithmetic."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _two_diff(a: Array, b: Array):
    """Exact difference a-b = s + e (Knuth two-sum on (a, -b))."""
    s = a - b
    bb = s - a
    e = (a - (s - bb)) + (-b - bb)
    return s, e


def _edge_fn_dw(ax, ay, bx, by):
    """Double-word evaluation of ax*by - ay*bx: sign-exact to ~2^-48.

    Plays the role of the reference's f64 recomputation (rtk.c:306-336)
    without needing f64 (TPU f64 is emulated and slow).
    """
    p1, e1 = _two_prod(ax, by)
    p2, e2 = _two_prod(ay, bx)
    s, e3 = _two_diff(p1, p2)
    return s + (e3 + (e1 - e2))


def watertight_uvw(x0, y0, x1, y1, x2, y2, watertight: bool = True):
    """Shear-space edge functions with exact-zero fix-up (rtk.c:298-336)."""
    u = x1 * y2 - y1 * x2
    v = x2 * y0 - y2 * x0
    w = x0 * y1 - y0 * x1
    if watertight:
        any_zero = (u == 0.0) | (v == 0.0) | (w == 0.0)
        u = jnp.where(any_zero, _edge_fn_dw(x1, y1, x2, y2), u)
        v = jnp.where(any_zero, _edge_fn_dw(x2, y2, x0, y0), v)
        w = jnp.where(any_zero, _edge_fn_dw(x0, y0, x1, y1), w)
    return u, v, w


def intersect_triangles(
    origin: Array,
    shear: ShearBasis,
    tri_v: Array,
    min_t: Array,
    cur_t: Array,
    watertight: bool = True,
):
    """Intersect each ray against K triangles.

    Args:
      origin: (..., 3) ray origins.
      shear: per-ray ShearBasis with (...,) fields.
      tri_v: (..., K, 3, 3) triangle vertices [tri, vertex, xyz].
      min_t: (...,) ray minimum t.
      cur_t: (...,) current closest hit t (exclusive upper bound).

    Returns:
      (t, u, v, valid): each (..., K); u, v already divided by det
      (barycentric weights of vertices 0 and 1).  Invalid lanes have
      valid=False (their t may be inf/NaN).
    """
    o = origin[..., None, None, :]  # (...,1,1,3)
    rel = tri_v - o  # (..., K, 3, 3)
    take = lambda idx: jnp.take_along_axis(
        rel, idx[..., None, None, None], axis=-1
    )[..., 0]
    vx = take(shear.kx)  # (..., K, 3)
    vy = take(shear.ky)
    vz = take(shear.kz)
    sx = shear.sx[..., None, None]
    sy = shear.sy[..., None, None]
    sz = shear.sz[..., None, None]
    x = vx + sx * vz  # (..., K, 3)
    y = vy + sy * vz
    z = sz * vz

    u, v, w = watertight_uvw(
        x[..., 0], y[..., 0], x[..., 1], y[..., 1], x[..., 2], y[..., 2],
        watertight=watertight,
    )

    # All of u, v, w must share a sign (zero allowed) — rtk.c:338-344.
    lo = jnp.minimum(jnp.minimum(u, v), w)
    hi = jnp.maximum(jnp.maximum(u, v), w)
    bad_sign = (lo < 0.0) & (hi > 0.0)

    det = u + v + w
    rcp_det = jnp.float32(1.0) / det
    t = (u * z[..., 0] + v * z[..., 1] + w * z[..., 2]) * rcp_det
    # Open t interval, strict compares (rtk.c:354). NaN t fails both.
    in_window = (t > min_t[..., None]) & (t < cur_t[..., None])
    valid = in_window & ~bad_sign
    return t, u * rcp_det, v * rcp_det, valid


def slab_test(
    child_min: Array,
    child_max: Array,
    origin: Array,
    rcp_dir: Array,
    min_t: Array,
    cur_t: Array,
):
    """Ray vs W child AABBs, folded condition (rtk.c:449-473).

    Args:
      child_min/child_max: (..., W, 3).
      origin/rcp_dir: (..., 3).
      min_t/cur_t: (...,).

    Returns:
      (enter_t, hit): each (..., W); enter_t is max(near, min_t) for hit
      children and +inf for missed ones (rtk.c:470-471 blends inf).
    """
    o = origin[..., None, :]
    r = rcp_dir[..., None, :]
    # Select near/far planes by direction sign (rtk.c:458-463) rather than
    # min/max of the two plane distances: a 0*inf NaN must land on the side
    # where the NaN-suppressing fold discards it (SSE max/min drop NaN in
    # exactly this way in the reference's RTK_MM_MAX4/MIN4 chains).
    pos = r >= 0
    near = (jnp.where(pos, child_min, child_max) - o) * r
    far = (jnp.where(pos, child_max, child_min) - o) * r
    enter = jnp.fmax(
        jnp.fmax(near[..., 0], near[..., 1]),
        jnp.fmax(near[..., 2], min_t[..., None]),
    )
    exit_ = jnp.fmin(
        jnp.fmin(far[..., 0], far[..., 1]),
        jnp.fmin(far[..., 2], cur_t[..., None]),
    )
    hit = enter <= exit_
    return jnp.where(hit, enter, F32_INF), hit


def rcp_direction(direction: Array) -> Array:
    """Exact 1/dir (rtk.c:410, RTK_MM_RCP is a divide). 0 -> signed inf."""
    return jnp.float32(1.0) / jnp.asarray(direction, jnp.float32)
