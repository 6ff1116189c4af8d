"""Macro-grid DDA incoherent-ray engine: exact parity with the flat
packet engine (trace/grid.py; PERF_NOTES r2 — the disjoint-bins fix for
the binned engine's no-early-exit overlap problem)."""
import pytest
import numpy as np

from rtk_tpu.config import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.trace.grid import (build_grid, calibrate_caps, choose_dims,
                                trace_packets_grid)
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays

CFG = BuildConfig(branching=8, leaf_size=8)


def _grid(subdiv=3, dims=None):
    tris = scenes.blob(subdivisions=subdiv)[0]
    return build_grid(tris, config=CFG, dims=dims)


def _assert_parity(got, ref):
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    mism = np.asarray(got.slot) != np.asarray(ref.slot)
    if mism.any():  # engines may differ at exact-t ties only
        dt = np.abs(np.asarray(got.t)[mism] - np.asarray(ref.t)[mism])
        assert dt.max() == 0.0
    _assert_records_self_consistent(got)


def _assert_records_self_consistent(got):
    """The reported triangle must really be hit at the reported (t, u, v)
    — a tie-tolerant slot check alone once missed a scrambled
    cells->flat record mapping (t was right, the triangle was not)."""
    import jax.numpy as jnp

    from rtk_tpu.ops.intersect import intersect_triangles, ray_shear

    hit = np.asarray(got.hit)
    if not hit.any():
        return
    tri = np.asarray(got.tri_v)[np.asarray(got.slot)[hit]]
    o = np.asarray(got.origin)[hit]
    d = np.asarray(got.direction)[hit]
    t, u, v, valid = intersect_triangles(
        jnp.asarray(o), ray_shear(jnp.asarray(d)), jnp.asarray(tri[:, None]),
        jnp.full((o.shape[0],), -np.inf, jnp.float32),
        jnp.full((o.shape[0],), np.inf, jnp.float32))
    np.testing.assert_allclose(np.asarray(t)[:, 0], np.asarray(got.t)[hit],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[:, 0], np.asarray(got.u)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[:, 0], np.asarray(got.v)[hit],
                               rtol=1e-4, atol=1e-5)
    assert np.asarray(valid)[:, 0].all()


def test_choose_dims_bounds():
    d = choose_dims(np.array([1.0, 2.0, 0.5]), 100000)
    assert all(1 <= x <= 32 for x in d)
    assert d[0] * d[1] * d[2] <= 4096


def test_grid_matches_flat_random_rays():
    g = _grid()
    rng = np.random.default_rng(3)
    n = 512
    rays = Rays.make(rng.normal(size=(n, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(n, 3)).astype(np.float32))
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True)
    _assert_parity(got, ref)


def test_grid_any_mode_and_records():
    g = _grid()
    rng = np.random.default_rng(5)
    n = 256
    rays = Rays.make(rng.normal(size=(n, 3)).astype(np.float32) * 0.4,
                     rng.normal(size=(n, 3)).astype(np.float32))
    ra = trace_packets(g.flat, rays, interpret=True, mode="any")
    ga = trace_packets_grid(g, rays, interpret=True, mode="any")
    np.testing.assert_array_equal(np.asarray(ga.hit), np.asarray(ra.hit))
    # closest-mode records resolve to real original-soup triangles
    gc = trace_packets_grid(g, rays, interpret=True)
    hit = np.asarray(gc.hit)
    prim = np.asarray(gc.triangle_index)
    assert (prim[hit] >= 0).all()


@pytest.mark.smoke
def test_grid_tiny_round_budget_stays_exact():
    """rounds=1 forces most rays through the full-tree residual."""
    g = _grid()
    rng = np.random.default_rng(7)
    rays = Rays.make(rng.normal(size=(256, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(256, 3)).astype(np.float32))
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True, rounds=1, skips=1)
    _assert_parity(got, ref)


def test_grid_caps_drop_to_residual():
    """A tiny per-round capacity drops rays; the residual must cover."""
    g = _grid()
    rng = np.random.default_rng(9)
    rays = Rays.make(rng.normal(size=(512, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(512, 3)).astype(np.float32))
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True, rounds=4,
                             caps=(1024,))
    _assert_parity(got, ref)


def test_grid_shrinking_caps_stay_exact():
    """A segmented cap schedule (full -> shrinking) must stay exact:
    marching rays sort into the prefix each round, and anything a
    too-small cap strands is aborted into the residual."""
    g = _grid()
    rng = np.random.default_rng(11)
    rays = Rays.make(rng.normal(size=(512, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(512, 3)).astype(np.float32))
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True, rounds=6,
                             caps=(10 ** 9, 10 ** 9, 4096, 2048))
    _assert_parity(got, ref)


def test_grid_gather_sort_mode_matches():
    """sort_mode='gather' (permutation + packed row-gathers) must be
    bit-identical to the multi-operand sort path."""
    g = _grid()
    rng = np.random.default_rng(17)
    rays = Rays.make(rng.normal(size=(512, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(512, 3)).astype(np.float32))
    ref = trace_packets_grid(g, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True, sort_mode="gather")
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.slot),
                                  np.asarray(ref.slot))


def test_grid_calibrated_caps_stay_exact():
    """calibrate_caps on a sample yields a monotone-ish schedule that the
    engine runs exactly (stranded rays fall to the residual)."""
    g = _grid()
    rng = np.random.default_rng(13)
    rays = Rays.make(rng.normal(size=(512, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(512, 3)).astype(np.float32))
    caps = calibrate_caps(g, rays, rounds=4, skips=2, interpret=True)
    assert len(caps) == 4 and caps[0] == 2 ** 31 - 1
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True, rounds=4, skips=2,
                             caps=caps)
    _assert_parity(got, ref)


def test_grid_outside_origin_and_dead_rays():
    g = _grid()
    o = np.array([[10.0, 10.0, 10.0], [10.0, 10.0, 10.0],
                  [0.1, 0.0, 0.0]], np.float32)
    d = np.array([[-1.0, -1.0, -1.0], [1.0, 0.5, 0.25],
                  [1.0, 0.0, 0.0]], np.float32)
    rays = Rays.make(np.repeat(o, 43, axis=0), np.repeat(d, 43, axis=0))
    ref = trace_packets(g.flat, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True)
    _assert_parity(got, ref)


def test_grid_explicit_dims_and_bounce_batch():
    tris = scenes.blob(subdivisions=4)[0]
    g = build_grid(tris, config=CFG, dims=(6, 5, 4))
    cam = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 32, 32,
                             order="morton")
    prim = trace_packets(g.flat, cam, interpret=True)
    import jax
    import jax.numpy as jnp
    from rtk_tpu.models.path import cosine_sample, geometric_normal

    nrm = geometric_normal(prim, cam.direction)
    bd = cosine_sample(jax.random.PRNGKey(0), nrm)
    org = prim.position() + 1e-3 * nrm
    bounce = Rays(origin=org, direction=bd,
                  min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
                  max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    ref = trace_packets(g.flat, bounce, interpret=True)
    got = trace_packets_grid(g, bounce, interpret=True)
    _assert_parity(got, ref)


def test_grid_multimesh_records():
    """Multi-mesh soup: mesh_index/triangle_index must survive the grid
    engine's record unification (regression: build_grid used to discard
    a caller-supplied Scene when flat was also given, falling back to
    flat.tri_prim — the per-MESH prim index — as a soup id)."""
    from rtk_tpu import build_scene
    from rtk_tpu.trace.grid import build_grid_from_scene

    ta = scenes.blob(subdivisions=2)[0]
    tb = scenes.blob(subdivisions=2)[0] + np.float32([1.5, 0, 0])
    meshes = [(t.reshape(-1, 3), np.arange(t.shape[0] * 3).reshape(-1, 3))
              for t in (ta, tb)]
    scene = build_scene(meshes, CFG)
    from rtk_tpu.trace.packed import pack_scene

    packed = pack_scene(scene)
    g = build_grid_from_scene(scene, packed=packed)
    rng = np.random.default_rng(31)
    n = 512
    rays = Rays.make(
        (rng.normal(size=(n, 3)).astype(np.float32) * 0.6
         + np.float32([0.75, 0, 0])),
        rng.normal(size=(n, 3)).astype(np.float32))
    ref = trace_packets(packed, rays, interpret=True)
    got = trace_packets_grid(g, rays, interpret=True)
    _assert_parity(got, ref)
    hit = np.asarray(got.hit) & (np.asarray(got.slot)
                                 == np.asarray(ref.slot))
    np.testing.assert_array_equal(np.asarray(got.mesh_index)[hit],
                                  np.asarray(ref.mesh_index)[hit])
    np.testing.assert_array_equal(np.asarray(got.triangle_index)[hit],
                                  np.asarray(ref.triangle_index)[hit])
    assert set(np.unique(np.asarray(got.mesh_index)[hit])) <= {0, 1}
    assert (np.asarray(got.mesh_index)[hit] == 1).any()


def test_grid_engine_via_tracer():
    """Tracer(engine='grid') builds the grid lazily from the Scene and
    matches the packet engine."""
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.tracer import Tracer

    tris = scenes.blob(subdivisions=3)[0]
    scene = build_from_soup(tris, config=CFG)
    rng = np.random.default_rng(23)
    rays = Rays.make(rng.normal(size=(256, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(256, 3)).astype(np.float32))
    tr = Tracer(scene, engine="grid")
    got = tr.closest(rays)
    ref = trace_packets(tr.packed, rays, interpret=True)
    _assert_parity(got, ref)


@pytest.mark.parametrize("engine", ["packet", "binned", "grid", "march"])
def test_filter_mask_culls_across_engines(engine):
    """tri_mask culling must hold through EVERY packet-kernel engine —
    the re-binning rounds AND their exact residuals (VERDICT r2 item 8:
    the grid cell tables dropped the mask column)."""
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.tracer import Tracer

    tris = scenes.blob(subdivisions=3)[0]
    t = tris.shape[0]
    scene = build_from_soup(tris, config=CFG)
    tri_mask = np.where(np.arange(t) % 2 == 1, 1, 2).astype(np.uint32)
    rng = np.random.default_rng(31)
    rays = Rays.make(rng.normal(size=(256, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(256, 3)).astype(np.float32))

    tr = Tracer(scene, engine=engine, tri_mask=tri_mask)
    got = tr.closest(rays, filter_mask=1)
    gh = np.asarray(got.hit)
    assert gh.any()
    assert (np.asarray(got.triangle_index)[gh] % 2 == 1).all()
    # parity with the packet engine under the same mask
    ref = trace_packets(tr.packed, rays, interpret=True, filter_mask=1)
    _assert_parity(got, ref)
    # sharded grid path culls too (mask tables replicated per chip)
    if engine == "grid":
        import jax
        from jax.sharding import Mesh

        from rtk_tpu.parallel.shard import trace_grid_sharded

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("rays",))
        gs = trace_grid_sharded(tr._grid, rays, mesh, rounds=3, skips=1,
                                filter_mask=1, interpret=True)
        gsh = np.asarray(gs.hit)
        assert gsh.any()
        assert (np.asarray(gs.triangle_index)[gsh] % 2 == 1).all()


@pytest.mark.smoke
def test_march_fused_parity():
    """Fused in-kernel march (trace_packets_march): bit parity with the
    flat packet engine on incoherent AND coherent batches, any-mode, and
    t-windows — with NO round/capacity budget (exact by construction)."""
    from rtk_tpu.trace.grid import build_grid, trace_packets_march

    tris = scenes.blob(subdivisions=3)[0]
    g = build_grid(tris, config=CFG, dims=(3, 2, 3), march=True)

    rng = np.random.default_rng(7)
    n = 512
    rays = Rays.make(rng.normal(size=(n, 3)).astype(np.float32) * 0.6,
                     rng.normal(size=(n, 3)).astype(np.float32))
    got = trace_packets_march(g, rays, interpret=True, pkt=128)
    ref = trace_packets(g.flat, rays, interpret=True)
    _assert_parity(got, ref)

    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 32, 32)
    got_c = trace_packets_march(g, cam, interpret=True, pkt=128)
    ref_c = trace_packets(g.flat, cam, interpret=True)
    _assert_parity(got_c, ref_c)
    assert np.asarray(got_c.hit).any() and not np.asarray(got_c.hit).all()

    ga = trace_packets_march(g, rays, mode="any", interpret=True, pkt=128)
    ra = trace_packets(g.flat, rays, mode="any", interpret=True)
    np.testing.assert_array_equal(np.asarray(ga.hit), np.asarray(ra.hit))

    rays_w = Rays.make(rng.normal(size=(n, 3)).astype(np.float32) * 0.6,
                       rng.normal(size=(n, 3)).astype(np.float32),
                       min_t=0.3, max_t=0.9)
    gw = trace_packets_march(g, rays_w, interpret=True, pkt=128)
    rw = trace_packets(g.flat, rays_w, interpret=True)
    _assert_parity(gw, rw)
    tt = np.asarray(gw.t)[np.asarray(gw.hit)]
    assert ((tt > 0.3) & (tt < 0.9)).all()


def test_march_filter_mask_culls():
    from rtk_tpu.trace.grid import build_grid, trace_packets_march

    tris = scenes.blob(subdivisions=3)[0]
    t = tris.shape[0]
    tm = np.where(np.arange(t) % 2 == 1, 1, 2).astype(np.uint32)
    g = build_grid(tris, config=CFG, dims=(3, 2, 3), march=True,
                   tri_mask=tm)
    rng = np.random.default_rng(3)
    rays = Rays.make(rng.normal(size=(384, 3)).astype(np.float32) * 0.6,
                     rng.normal(size=(384, 3)).astype(np.float32))
    got = trace_packets_march(g, rays, interpret=True, pkt=128,
                              filter_mask=1)
    gh = np.asarray(got.hit)
    assert gh.any()
    assert (np.asarray(got.triangle_index)[gh] % 2 == 1).all()
    ref = trace_packets(g.flat, rays, interpret=True, filter_mask=1)
    _assert_parity(got, ref)


def test_march_requires_march_pack():
    from rtk_tpu.trace.grid import build_grid, trace_packets_march

    tris = scenes.blob(subdivisions=3)[0]
    g = build_grid(tris, config=CFG, dims=(3, 2, 3))
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 8, 8)
    with np.testing.assert_raises(ValueError):
        trace_packets_march(g, rays, interpret=True)
