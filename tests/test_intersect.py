"""Unit tests for the watertight intersector and slab test."""
import jax.numpy as jnp
import numpy as np

from rtk_tpu.ops.intersect import (
    intersect_triangles,
    ray_shear,
    rcp_direction,
    slab_test,
)


def _single(origin, direction, tri, min_t=0.0, cur_t=1e30, watertight=True):
    origin = jnp.asarray([origin], jnp.float32)
    direction = jnp.asarray([direction], jnp.float32)
    shear = ray_shear(direction)
    tri = jnp.asarray(tri, jnp.float32).reshape(1, 1, 3, 3)
    t, u, v, valid = intersect_triangles(
        origin, shear, tri,
        jnp.asarray([min_t], jnp.float32), jnp.asarray([cur_t], jnp.float32),
        watertight=watertight,
    )
    return float(t[0, 0]), float(u[0, 0]), float(v[0, 0]), bool(valid[0, 0])


TRI = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]


def test_simple_hit():
    t, u, v, ok = _single([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], TRI)
    assert ok
    assert abs(t - 1.0) < 1e-6
    # u weights vertex0, v weights vertex1: p = u*v0 + v*v1 + w*v2
    # p=(0.2,0.2) => v (weight of (1,0)) = 0.2, w (weight of (0,1)) = 0.2
    assert abs(v - 0.2) < 1e-5
    assert abs((1 - u - v) - 0.2) < 1e-5


def test_miss_outside():
    _, _, _, ok = _single([1.2, 1.2, 1.0], [0.0, 0.0, -1.0], TRI)
    assert not ok


def test_backface_still_hits():
    # Sign-consistency test accepts both windings (rtk.c:338-344).
    t, _, _, ok = _single([0.2, 0.2, -1.0], [0.0, 0.0, 1.0], TRI)
    assert ok and abs(t - 1.0) < 1e-6


def test_t_window_open_interval():
    # t == max_t must be rejected (strict <, rtk.c:354).
    _, _, _, ok = _single([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], TRI, cur_t=1.0)
    assert not ok
    # t == min_t must be rejected (strict >).
    _, _, _, ok = _single([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], TRI, min_t=1.0)
    assert not ok
    _, _, _, ok = _single(
        [0.2, 0.2, 1.0], [0.0, 0.0, -1.0], TRI, min_t=0.999, cur_t=1.001)
    assert ok


def test_edge_and_vertex_hits():
    # Rays exactly through an edge / a vertex must hit (zeros allowed).
    _, _, _, ok = _single([0.5, 0.0, 1.0], [0.0, 0.0, -1.0], TRI)
    assert ok
    _, _, _, ok = _single([0.0, 0.0, 1.0], [0.0, 0.0, -1.0], TRI)
    assert ok
    _, _, _, ok = _single([0.5, 0.5, 1.0], [0.0, 0.0, -1.0], TRI)
    assert ok  # diagonal edge


def test_watertight_closed_mesh_no_leaks():
    """Rays from inside a closed mesh aimed at edge midpoints and vertices
    must always hit something — the property rtk's f64 fallback exists to
    guarantee (rtk.c:294-336).  Tested against the whole triangle set (no
    BVH) so only the intersector is on trial."""
    from rtk_tpu.testing.scenes import icosphere

    verts, faces = icosphere(2)  # 320 tris, closed
    tris = jnp.asarray(verts[faces], jnp.float32)  # (F, 3, 3)
    f = faces.shape[0]

    # Targets: all edge midpoints, all vertices, and random edge points.
    rng = np.random.default_rng(7)
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    lam = rng.uniform(0.0, 1.0, size=(edges.shape[0], 1)).astype(np.float32)
    edge_pts = verts[edges[:, 0]] * (1 - lam) + verts[edges[:, 1]] * lam
    mids = (verts[edges[:, 0]] + verts[edges[:, 1]]) * 0.5
    targets = np.concatenate([mids, edge_pts, verts], axis=0)

    origins = np.zeros_like(targets)  # center of the sphere is inside
    directions = targets  # aim at each target

    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(directions, jnp.float32)
    shear = ray_shear(d)
    t, u, v, valid = intersect_triangles(
        o, shear, jnp.broadcast_to(tris[None], (o.shape[0], f, 3, 3)),
        jnp.zeros((o.shape[0],), jnp.float32),
        jnp.full((o.shape[0],), 1e30, jnp.float32),
    )
    any_hit = np.asarray(jnp.any(valid, axis=1))
    assert any_hit.all(), f"{(~any_hit).sum()} leaked rays"


def test_degenerate_triangle_misses():
    _, _, _, ok = _single([0.2, 0.2, 1.0], [0.0, 0.0, -1.0],
                          [[0, 0, 0], [0, 0, 0], [0, 0, 0]])
    assert not ok


def test_shear_axis_priority():
    # Ties on |dir| components pick x, then y, then z (rtk.c:553).
    s = ray_shear(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32))
    assert int(s.kz[0]) == 0
    s = ray_shear(jnp.asarray([[0.5, 1.0, 1.0]], jnp.float32))
    assert int(s.kz[0]) == 1


def test_slab_basic():
    cmin = jnp.asarray([[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]]], jnp.float32)
    cmax = jnp.asarray([[[1.0, 1.0, 1.0], [3.0, 1.0, 1.0]]], jnp.float32)
    origin = jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32)
    rcp = rcp_direction(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    ts, hit = slab_test(cmin, cmax, origin, rcp,
                        jnp.asarray([0.0], jnp.float32),
                        jnp.asarray([1e30], jnp.float32))
    assert bool(hit[0, 0]) and not bool(hit[0, 1])
    assert abs(float(ts[0, 0]) - 1.0) < 1e-6


def test_slab_zero_direction_component():
    # Ray parallel to a slab axis, origin inside that slab: must still hit.
    cmin = jnp.asarray([[[0.0, 0.0, 0.0]]], jnp.float32)
    cmax = jnp.asarray([[[1.0, 1.0, 1.0]]], jnp.float32)
    origin = jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32)
    rcp = rcp_direction(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    ts, hit = slab_test(cmin, cmax, origin, rcp,
                        jnp.asarray([0.0], jnp.float32),
                        jnp.asarray([1e30], jnp.float32))
    assert bool(hit[0, 0])
    # Origin exactly on the slab boundary (0 * inf = NaN path).
    origin = jnp.asarray([[0.0, 0.5, -1.0]], jnp.float32)
    ts, hit = slab_test(cmin, cmax, origin, rcp,
                        jnp.asarray([0.0], jnp.float32),
                        jnp.asarray([1e30], jnp.float32))
    assert bool(hit[0, 0])
    # Origin outside the slab, parallel: must miss.
    origin = jnp.asarray([[-0.5, 0.5, -1.0]], jnp.float32)
    ts, hit = slab_test(cmin, cmax, origin, rcp,
                        jnp.asarray([0.0], jnp.float32),
                        jnp.asarray([1e30], jnp.float32))
    assert not bool(hit[0, 0])


def test_inverted_bounds_always_miss():
    # Empty wide-node slots carry inverted bounds (+1/-1), rtk.c:1612-1620.
    cmin = jnp.ones((1, 1, 3), jnp.float32)
    cmax = -jnp.ones((1, 1, 3), jnp.float32)
    for d in ([0, 0, 1], [1, 1, 1], [0, 1, 0]):
        rcp = rcp_direction(jnp.asarray([d], jnp.float32))
        _, hit = slab_test(cmin, cmax, jnp.zeros((1, 3), jnp.float32), rcp,
                           jnp.asarray([0.0], jnp.float32),
                           jnp.asarray([1e30], jnp.float32))
        assert not bool(hit[0, 0])
