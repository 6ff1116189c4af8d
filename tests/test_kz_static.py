"""kz_static: batch-uniform compile-time shear axis (pallas_trace).

With every ray's dominant |direction| axis equal to kz_static, the
static shear basis computes the SAME values as the dynamic per-ray one
(and the once-rotated table holds the same coordinates the dynamic
selects would pick), so results must be BIT-equal — including the
watertight exact-sign path (rtk.c:181-388 semantics are axis-setup
independent)."""
import numpy as np
import pytest

from rtk_tpu import build_scene
from rtk_tpu.ops.pallas_trace import trace_packets, uniform_kz
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes


@pytest.fixture(scope="module")
def packed():
    tris = scenes.blob(subdivisions=3)[0]
    scene = build_scene(
        (tris.reshape(-1, 3), np.arange(tris.shape[0] * 3).reshape(-1, 3)))
    return pack_scene(scene)


CAMS = {
    # axis -> camera looking down it (fov 45 => kz-uniform by construction)
    2: ((0, 0, 3.0), (0, 1, 0)),
    0: ((3.0, 0, 0), (0, 1, 0)),
    1: ((0, 3.0, 0), (1, 0, 0)),
}


def _cam(axis, side=64):
    pos, up = CAMS[axis]
    return scenes.camera_rays(pos, (0, 0, 0), up, 45, side, side,
                              order="morton")


def _assert_bitequal(a, b):
    for f in ("hit", "t", "u", "v", "slot"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_kz_static_bitequal(packed, axis):
    cam = _cam(axis)
    assert uniform_kz(cam) == axis
    base = trace_packets(packed, cam, interpret=True, sort_rays=False)
    got = trace_packets(packed, cam, interpret=True, sort_rays=False,
                        kz_static=axis)
    assert int(np.asarray(base.hit).sum()) > 0
    _assert_bitequal(got, base)


def test_kz_static_dual_ordered_any(packed):
    cam = _cam(2)
    for kw in (dict(dual=True, ordered=True), dict(mode="any"),
               dict(sort_rays=True)):
        base = trace_packets(packed, cam, interpret=True, **kw)
        got = trace_packets(packed, cam, interpret=True, kz_static=2, **kw)
        _assert_bitequal(got, base)


def test_uniform_kz_mixed_returns_none():
    rng = np.random.default_rng(3)
    from rtk_tpu.types import Rays

    rays = Rays.make(rng.normal(size=(64, 3)).astype(np.float32),
                     rng.normal(size=(64, 3)).astype(np.float32))
    assert uniform_kz(rays) is None


def test_kz_static_rejects_bad_combos(packed):
    cam = _cam(2)
    with pytest.raises(ValueError):
        trace_packets(packed, cam, interpret=True, kz_static=5)
    with pytest.raises(ValueError):
        trace_packets(packed, cam, interpret=True, kz_static=2,
                      narrow=False)


def test_step_quant_sah_parity_and_occupancy():
    """rtko_build3 (step-quantized SAH): same hits as classic SAH modulo
    exact-t ties, and materially denser leaves."""
    try:
        from rtk_tpu.testing.native_oracle import NativeOracle
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native oracle unavailable: {e}")
    from rtk_tpu.trace.packed import pack_binary_tree

    tris = scenes.blob(subdivisions=3)[0]
    cam = _cam(2, side=48)
    res = {}
    occ = {}
    for sq in (False, True):
        orc = NativeOracle(tris.reshape(-1, 9), leaf_max=8, step_quant=sq)
        left, right, first, count, *_ = orc.export_tree()
        sizes = count[left < 0]
        occ[sq] = sizes.sum() / (sizes.shape[0] * 8)
        pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=8)
        res[sq] = trace_packets(pk, cam, interpret=True, sort_rays=False)
    np.testing.assert_array_equal(np.asarray(res[0].hit),
                                  np.asarray(res[1].hit))
    np.testing.assert_allclose(np.asarray(res[0].t), np.asarray(res[1].t),
                               rtol=1e-6, atol=1e-6)
    assert occ[True] > occ[False] + 0.1, occ
