"""Three-way agreement: JAX tracer vs f64 brute force vs native C++ oracle."""
import numpy as np
import pytest

from rtk_tpu import Rays, build_scene, trace_closest
from rtk_tpu.oracle import trace_brute
from rtk_tpu.testing import scenes

native = pytest.importorskip("rtk_tpu.testing.native_oracle")


def _soup_of(tris):
    t = tris.shape[0]
    return (tris.reshape(-1, 3), np.arange(t * 3).reshape(-1, 3))


def test_native_vs_brute_vs_jax():
    tris = scenes.cornell_box()
    oracle = native.NativeOracle(tris)
    rays = scenes.cornell_camera(32, 32)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    t, u, v, idx = oracle.trace(o, d, np.asarray(rays.min_t),
                                np.asarray(rays.max_t))
    want = trace_brute(tris, rays)
    wh = np.asarray(want.hit)
    np.testing.assert_array_equal(idx >= 0, wh)
    np.testing.assert_allclose(t[wh], np.asarray(want.t)[wh], atol=1e-4)

    got = trace_closest(build_scene(_soup_of(tris)), rays)
    np.testing.assert_array_equal(np.asarray(got.hit), idx >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[wh], t[wh], atol=1e-4)


def test_native_anyhit():
    tris = scenes.cornell_box()
    oracle = native.NativeOracle(tris)
    rays = scenes.cornell_camera(8, 8)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    tc, _, _, ic = oracle.trace(o, d, np.asarray(rays.min_t),
                                np.asarray(rays.max_t))
    ta, _, _, ia = oracle.trace(o, d, np.asarray(rays.min_t),
                                np.asarray(rays.max_t), mode="any")
    np.testing.assert_array_equal(ic >= 0, ia >= 0)
    assert (ta[ia >= 0] >= tc[ic >= 0] - 1e-6).all()


def test_native_random_soup():
    rng = np.random.default_rng(9)
    tris = rng.normal(size=(500, 3, 3)).astype(np.float32)
    oracle = native.NativeOracle(tris)
    o = (rng.normal(size=(800, 3)) * 3).astype(np.float32)
    d = rng.normal(size=(800, 3)).astype(np.float32)
    rays = Rays.make(o, d)
    t, u, v, idx = oracle.trace(o, d, np.zeros(800, np.float32),
                                np.full(800, 3.4e38, np.float32))
    want = trace_brute(tris, rays)
    wh = np.asarray(want.hit)
    np.testing.assert_array_equal(idx >= 0, wh)
    np.testing.assert_allclose(t[wh], np.asarray(want.t)[wh], rtol=1e-4,
                               atol=1e-4)
    same = wh & (idx == np.asarray(want.triangle_index))
    assert same.sum() / max(wh.sum(), 1) > 0.95
    np.testing.assert_allclose(u[same], np.asarray(want.u)[same], atol=1e-3)
    np.testing.assert_allclose(v[same], np.asarray(want.v)[same], atol=1e-3)


def test_native_host_decode_matches_numpy():
    """Threaded C++ decode (native/rtk_host.cpp) must agree bit-for-bit
    with the NumPy strided decode across types/strides."""
    import numpy as np

    from rtk_tpu.utils import native_host

    if not native_host.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    # f32 strided (vertex records with 4 bytes of padding)
    v = rng.normal(size=(5000, 3)).astype(np.float32)
    rec = np.zeros((5000, 4), np.float32)
    rec[:, :3] = v
    got = native_host.decode_positions(rec.tobytes(), 5000, 16, "f32")
    np.testing.assert_array_equal(got, v)
    # f64 tightly packed
    v64 = rng.normal(size=(3000, 3))
    got = native_host.decode_positions(v64.tobytes(), 3000, 24, "f64")
    np.testing.assert_array_equal(got, v64.astype(np.float32))
    # u16 indices with stride 8
    idx = rng.integers(0, 60000, size=4096).astype(np.uint16)
    buf = np.zeros((4096, 4), np.uint16)
    buf[:, 0] = idx
    got = native_host.decode_indices(buf.tobytes(), 4096, 8, "u16")
    np.testing.assert_array_equal(got, idx.astype(np.uint32))
    # gather
    gi = rng.integers(0, 5000, size=9999).astype(np.uint32)
    np.testing.assert_array_equal(native_host.gather_soup(v, gi), v[gi])


def test_sse_bvh4_matches_scalar():
    """Clean-room SSE BVH4 (r5 honest CPU baseline) vs the scalar BVH2
    oracle: same hit mask, t within float tolerance, prims modulo ties."""
    from rtk_tpu.utils.native_sah import NativeOracleSSE

    tris = scenes.blob(subdivisions=3)[0]
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 48, 48)
    o = np.asarray(cam.origin)
    d = np.asarray(cam.direction)
    mn = np.asarray(cam.min_t)
    mx = np.asarray(cam.max_t)
    a = native.NativeOracle(tris.reshape(-1, 9))
    b = NativeOracleSSE(tris.reshape(-1, 9))
    ta, ua, va, ia = a.trace(o, d, mn, mx)
    tb, ub, vb, ib = b.trace(o, d, mn, mx)
    hm = ia >= 0
    np.testing.assert_array_equal(hm, ib >= 0)
    np.testing.assert_allclose(tb[hm], ta[hm], rtol=1e-5, atol=1e-6)
    same = hm & (ia == ib)
    assert same.sum() / max(hm.sum(), 1) > 0.95
    np.testing.assert_allclose(ub[same], ua[same], atol=1e-4)
    np.testing.assert_allclose(vb[same], va[same], atol=1e-4)
    # any-hit: exactly the closest-hit mask on this config
    _, _, _, i2 = b.trace(o, d, mn, mx, mode="any")
    np.testing.assert_array_equal(i2 >= 0, hm)
