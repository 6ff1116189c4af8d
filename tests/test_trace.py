"""End-to-end trace vs the brute-force oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtk_tpu import BuildConfig, Rays, TraceConfig, build_scene, refit, trace_any, trace_closest
from rtk_tpu.mesh import build_soup
from rtk_tpu.oracle import trace_brute
from rtk_tpu.testing import scenes


def _soup_of(tris):
    """(T,3,3) -> mesh tuple with implicit indices."""
    t = tris.shape[0]
    return (tris.reshape(-1, 3), np.arange(t * 3).reshape(-1, 3))


def _compare(tris, rays, scene=None, config=BuildConfig(), atol=1e-4):
    if scene is None:
        scene = build_scene(_soup_of(tris), config)
    got = trace_closest(scene, rays)
    want = trace_brute(tris, rays)
    got_hit = np.asarray(got.hit)
    want_hit = np.asarray(want.hit)
    np.testing.assert_array_equal(got_hit, want_hit)
    scale = np.maximum(1.0, np.abs(np.asarray(want.t)))
    err = np.abs(np.asarray(got.t) - np.asarray(want.t)) / scale
    assert err[want_hit].max(initial=0.0) < atol, err[want_hit].max()
    # Same triangle -> same barycentrics; ties may legitimately differ, so
    # only compare u,v where the primitive matches.
    same = want_hit & (np.asarray(got.triangle_index)
                       == np.asarray(want.triangle_index))
    frac_same = same.sum() / max(want_hit.sum(), 1)
    # Rays through shared edges/corners legitimately tie between adjacent
    # primitives (both records have matching t, checked above).
    assert frac_same > 0.95
    for a, b in ((got.u, want.u), (got.v, want.v)):
        err = np.abs(np.asarray(a) - np.asarray(b))
        assert err[same].max(initial=0.0) < 1e-3
    return got, want


def test_cornell_primary():
    tris = scenes.cornell_box()
    rays = scenes.cornell_camera(64, 64)
    got, _ = _compare(tris, rays)
    assert np.asarray(got.hit).all()  # closed box: every ray hits


def test_cornell_all_branchings():
    tris = scenes.cornell_box()
    rays = scenes.cornell_camera(32, 32)
    for w in (2, 4, 8):
        for leaf in (1, 2, 4, 8):
            _compare(tris, rays, config=BuildConfig(branching=w, leaf_size=leaf))


def test_random_soup_random_rays():
    rng = np.random.default_rng(11)
    tris = rng.normal(size=(257, 3, 3)).astype(np.float32)
    origins = rng.normal(size=(500, 3)).astype(np.float32) * 3.0
    dirs = rng.normal(size=(500, 3)).astype(np.float32)
    rays = Rays.make(origins, dirs)
    _compare(tris, rays)


def test_blob_camera():
    tris, _, _ = scenes.blob(subdivisions=3)  # 1280 tris
    rays = scenes.camera_rays((0, 0, 3.5), (0, 0, 0), (0, 1, 0), 45, 48, 48)
    _compare(tris, rays)


@pytest.mark.smoke
def test_ray_t_window():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    scene = build_scene(_soup_of(tri))
    # max_t short of the triangle -> miss
    rays = Rays.make([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], max_t=0.5)
    assert not bool(trace_closest(scene, rays).hit[0])
    # min_t beyond the triangle -> miss
    rays = Rays.make([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], min_t=1.5)
    assert not bool(trace_closest(scene, rays).hit[0])
    rays = Rays.make([0.2, 0.2, 1.0], [0.0, 0.0, -1.0], min_t=0.5, max_t=1.5)
    hit = trace_closest(scene, rays)
    assert bool(hit.hit[0]) and abs(float(hit.t[0]) - 1.0) < 1e-6


@pytest.mark.smoke
def test_hit_record_fields():
    tris = scenes.cornell_box()
    soup = build_soup(_soup_of(tris))
    scene = build_scene(_soup_of(tris))
    rays = scenes.cornell_camera(16, 16)
    hits = trace_closest(scene, rays)
    h = np.asarray(hits.hit)
    assert h.all()
    tri_idx = np.asarray(hits.triangle_index)
    # vertex positions must be the actual triangle vertices
    np.testing.assert_allclose(
        np.asarray(hits.vertex_position), tris[tri_idx], rtol=0, atol=0)
    # vertex indices are the original (implicit) indices 3i, 3i+1, 3i+2
    np.testing.assert_array_equal(
        np.asarray(hits.vertex_index),
        np.stack([tri_idx * 3, tri_idx * 3 + 1, tri_idx * 3 + 2], axis=1))
    # interpolated position lies on the ray: |o + t*d - p| small
    p = np.asarray(hits.position())
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    t = np.asarray(hits.t)
    np.testing.assert_allclose(p, o + t[:, None] * d, atol=1e-3)


def test_any_hit_subset_of_closest():
    tris = scenes.cornell_box()
    rays = scenes.cornell_camera(32, 32)
    scene = build_scene(_soup_of(tris))
    closest = trace_closest(scene, rays)
    any_ = trace_any(scene, rays)
    c = np.asarray(closest.hit)
    a = np.asarray(any_.hit)
    np.testing.assert_array_equal(c, a)  # same hit/miss classification
    # any-hit t must be >= closest t (it's *a* hit, not the nearest)
    assert (np.asarray(any_.t)[a] >= np.asarray(closest.t)[a] - 1e-6).all()


def test_filter_rejects_everything():
    tris = scenes.cornell_box()
    rays = scenes.cornell_camera(8, 8)
    scene = build_scene(_soup_of(tris))
    reject = lambda cand: jnp.zeros_like(cand.t, dtype=bool)
    hits = trace_closest(scene, rays, filter_fn=reject)
    assert not np.asarray(hits.hit).any()
    hits = trace_any(scene, rays, filter_fn=reject)
    assert not np.asarray(hits.hit).any()


def test_filter_by_mesh():
    walls = scenes.cornell_box()[:10]  # walls only
    boxes = scenes.cornell_box()[10:]
    soup = build_soup([
        (walls.reshape(-1, 3), np.arange(walls.shape[0] * 3).reshape(-1, 3)),
        (boxes.reshape(-1, 3), np.arange(boxes.shape[0] * 3).reshape(-1, 3)),
    ])
    scene = build_scene(soup)
    rays = scenes.cornell_camera(24, 24)
    only_walls = lambda cand: cand.mesh_index == 0
    hits = trace_closest(scene, rays, filter_fn=only_walls)
    h = np.asarray(hits.hit)
    assert h.all()
    assert (np.asarray(hits.mesh_index)[h] == 0).all()


def test_shadow_rays_blob():
    """Bunny-class config: primary + shadow (any-hit) rays."""
    tris, _, _ = scenes.blob(subdivisions=3)
    scene = build_scene(_soup_of(tris))
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 32, 32)
    prim = trace_closest(scene, rays)
    h = np.asarray(prim.hit)
    p = np.asarray(prim.position())[h]
    light = np.array([3.0, 4.0, 2.0], np.float32)
    d = light - p
    shadow = Rays.make(p, d, min_t=1e-3, max_t=1.0)
    occ = trace_any(scene, shadow)
    # Against the oracle
    want = trace_brute(tris, shadow)
    np.testing.assert_array_equal(np.asarray(occ.hit), np.asarray(want.hit))


def test_refit_matches_rebuild_results():
    t0 = scenes.deforming_grid(0.0, n=24)
    t1 = scenes.deforming_grid(0.7, n=24)
    scene = build_scene(_soup_of(t0))
    scene_refit = refit(scene, t1)
    rays = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 32, 32)
    got = trace_closest(scene_refit, rays)
    want = trace_brute(t1, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[h], np.asarray(want.t)[h], atol=1e-4)


def test_stackless_engine_matches():
    from rtk_tpu.trace.stackless import build_stackless, trace_stackless
    from rtk_tpu import BuildConfig

    tris = scenes.cornell_box()
    scene = build_scene(_soup_of(tris), BuildConfig(leaf_size=4))
    sl = build_stackless(scene)
    rays = scenes.cornell_camera(24, 24)
    want = trace_closest(scene, rays)
    got = trace_stackless(sl, rays)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    wh = np.asarray(want.hit)
    np.testing.assert_allclose(np.asarray(got.t)[wh], np.asarray(want.t)[wh],
                               atol=1e-6)
    # sorted-ray path returns results in original order
    got2 = trace_stackless(sl, rays, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(got2.t), np.asarray(got.t))
    # any-hit consistency
    ga = trace_stackless(sl, rays, mode="any")
    np.testing.assert_array_equal(np.asarray(ga.hit), wh)
