"""Brute-force reference tracer — the semantic anchor for all tests.

Independent math path from the production tracer: classic Möller–Trumbore in
float64 (the production path is Woop-style shear-space edge functions in f32,
rtk.c:181-388).  Two independent derivations agreeing within tolerance is the
test strategy (SURVEY.md §4); a corrected-rtk C++ oracle provides a third.

Runs on CPU (tests enable x64); O(rays × triangles), chunked over triangles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rtk_tpu.types import Hits, Rays


def _mt_intersect_f64(origin, direction, v0, v1, v2, min_t, max_t):
    """Möller–Trumbore, inclusive edges (watertight-equivalent zeros allowed).

    Returns (t, u, v, valid) with rtk's barycentric convention:
    u weights vertex 0, v weights vertex 1.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = 1.0 / det
    tvec = origin - v0
    q = jnp.cross(tvec, e1)
    a = jnp.sum(tvec * p, axis=-1) * inv  # weight of vertex 1
    b = jnp.sum(direction * q, axis=-1) * inv  # weight of vertex 2
    t = jnp.sum(e2 * q, axis=-1) * inv
    valid = (
        (det != 0.0)
        & (a >= 0.0)
        & (b >= 0.0)
        & (a + b <= 1.0)
        & (t > min_t)
        & (t < max_t)
    )
    return t, 1.0 - a - b, a, valid


def trace_brute(
    tri_pos: np.ndarray,
    rays: Rays,
    tri_mesh=None,
    tri_prim=None,
    tri_vidx=None,
    chunk: int = 4096,
    anyhit: bool = False,
) -> Hits:
    """Closest-hit (or any-hit) trace of every ray against every triangle.

    Args:
      tri_pos: (T, 3, 3) triangle vertices.
      rays: batch of N rays.
      tri_mesh/tri_prim/tri_vidx: optional per-triangle metadata; default
        mesh 0, prim = array index, vidx = 3i+corner.
    """
    tri_pos = np.asarray(tri_pos, np.float64)
    t_count = tri_pos.shape[0]
    if tri_mesh is None:
        tri_mesh = np.zeros((t_count,), np.int32)
    if tri_prim is None:
        tri_prim = np.arange(t_count, dtype=np.int32)
    if tri_vidx is None:
        tri_vidx = np.arange(t_count * 3, dtype=np.int32).reshape(t_count, 3)

    n = rays.count
    o = jnp.asarray(rays.origin, jnp.float64)
    d = jnp.asarray(rays.direction, jnp.float64)
    mn = jnp.asarray(rays.min_t, jnp.float64)
    mx = jnp.asarray(rays.max_t, jnp.float64)

    pad = (-t_count) % chunk
    if pad:
        tri_pos = np.concatenate([tri_pos, np.zeros((pad, 3, 3))], axis=0)
    tris = jnp.asarray(tri_pos).reshape(-1, chunk, 3, 3)
    n_chunks = tris.shape[0]

    def step(carry, chunk_tris):
        best_t, best_idx, best_u, best_v, ci = carry
        v0 = chunk_tris[None, :, 0, :]
        v1 = chunk_tris[None, :, 1, :]
        v2 = chunk_tris[None, :, 2, :]
        t, u, v, valid = _mt_intersect_f64(
            o[:, None, :], d[:, None, :], v0, v1, v2, mn[:, None], mx[:, None]
        )
        t = jnp.where(valid, t, jnp.inf)
        # Tie-break: strictly smaller t wins; equal t keeps the earlier
        # triangle (argmin picks the first minimum in the chunk).
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], axis=1)[:, 0]
        improved = tk < best_t
        idx = ci * chunk + k.astype(jnp.int32)
        best_idx = jnp.where(improved, idx, best_idx)
        best_u = jnp.where(
            improved, jnp.take_along_axis(u, k[:, None], axis=1)[:, 0], best_u
        )
        best_v = jnp.where(
            improved, jnp.take_along_axis(v, k[:, None], axis=1)[:, 0], best_v
        )
        best_t = jnp.where(improved, tk, best_t)
        return (best_t, best_idx, best_u, best_v, ci + 1), None

    init = (
        jnp.full((n,), jnp.inf, jnp.float64),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float64),
        jnp.zeros((n,), jnp.float64),
        jnp.int32(0),
    )
    (best_t, best_idx, best_u, best_v, _), _ = jax.lax.scan(step, init, tris)

    hit = best_idx >= 0
    safe = jnp.maximum(best_idx, 0)
    tp = jnp.asarray(np.asarray(tri_pos, np.float32))
    return Hits(
        hit=np.asarray(hit),
        t=np.where(np.asarray(hit), np.asarray(best_t, np.float32), np.asarray(rays.max_t)),
        u=np.asarray(best_u, np.float32),
        v=np.asarray(best_v, np.float32),
        mesh_index=np.where(
            np.asarray(hit), tri_mesh[np.asarray(safe) % t_count], -1
        ).astype(np.int32),
        triangle_index=np.where(
            np.asarray(hit), tri_prim[np.asarray(safe) % t_count], -1
        ).astype(np.int32),
        vertex_position=np.asarray(tp)[np.asarray(safe) % t_count],
        vertex_index=np.where(
            np.asarray(hit)[:, None], tri_vidx[np.asarray(safe) % t_count], -1
        ).astype(np.int32),
    )
