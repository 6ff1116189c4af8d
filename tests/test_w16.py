"""W=16 node tables vs the classic W=8 path (CPU interpret parity).

r5: hl2 measured internal pops binding in 97.7% of headline blocks, so
pack_binary_tree(branching=16) builds 16-wide tables and the kernel
takes w_arity from PackedScene.branching (16-bit masks, 5-bit counts,
Batcher 63-comparator ordered descent).
"""
import numpy as np
import pytest

from rtk_tpu import Rays
from rtk_tpu.ops.pallas_trace import _oem_network, trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_binary_tree, pack_scene


def _packs():
    try:
        from rtk_tpu.testing.native_oracle import NativeOracle
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native oracle unavailable: {e}")
    tris = scenes.blob(subdivisions=3)[0]
    orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16, step_quant=True)
    tree = orc.export_tree()
    p8 = pack_binary_tree(tris, *tree, leaf_size=16)
    p16 = pack_binary_tree(tris, *tree, leaf_size=16, branching=16)
    return p8, p16


def test_oem_network_sorts_descending():
    rng = np.random.default_rng(0)
    net = _oem_network(16)
    assert len(net) == 63
    for _ in range(50):
        v = rng.random(16)
        a = v.copy()
        for i, j in net:
            if a[i] < a[j]:
                a[i], a[j] = a[j], a[i]
        np.testing.assert_array_equal(a, np.sort(v)[::-1])


def test_w16_parity_camera():
    p8, p16 = _packs()
    assert p16.branching == 16 and p16.nodes.shape[0] == p16.meta.shape[0] * 16
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 48, 48)
    for kw in ({}, dict(dual=True, ordered=True),
               dict(dual=True, ordered=True, leaf_loop=True,
                    defer_uv=True, kz_static=2)):
        ref = trace_packets(p8, cam, interpret=True, sort_rays=False, **kw)
        got = trace_packets(p16, cam, interpret=True, sort_rays=False, **kw)
        rh = np.asarray(ref.hit)
        np.testing.assert_array_equal(np.asarray(got.hit), rh)
        np.testing.assert_allclose(np.asarray(got.t)[rh],
                                   np.asarray(ref.t)[rh],
                                   rtol=1e-6, atol=1e-6)


def test_w16_packed_serialize_roundtrip():
    """branching must survive save/load (a W=16 blob reloading as 8
    would misread the 16-row-stride node table)."""
    import io

    from rtk_tpu.utils.serialize import load_packed_scene, save_packed_scene

    _, p16 = _packs()
    buf = io.BytesIO()
    save_packed_scene(p16, buf)
    p2 = load_packed_scene(buf.getvalue())
    assert p2.branching == 16
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 24, 24)
    a = trace_packets(p16, cam, interpret=True, sort_rays=False)
    b = trace_packets(p2, cam, interpret=True, sort_rays=False)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))


def test_w16_parity_incoherent_and_any():
    p8, p16 = _packs()
    rng = np.random.default_rng(4)
    rays = Rays.make((rng.normal(size=(800, 3)) * 2).astype(np.float32),
                     rng.normal(size=(800, 3)).astype(np.float32))
    kw = dict(dual=True, ordered=True, pkt=128, p_pk=8)
    ref = trace_packets(p8, rays, interpret=True, sort_rays=True, **kw)
    got = trace_packets(p16, rays, interpret=True, sort_rays=True, **kw)
    rh = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), rh)
    np.testing.assert_allclose(np.asarray(got.t)[rh],
                               np.asarray(ref.t)[rh], rtol=1e-6, atol=1e-6)
    # any-mode: masks must agree (t is first-accepted, order-dependent)
    ra = trace_packets(p8, rays, interpret=True, mode="any")
    ga = trace_packets(p16, rays, interpret=True, mode="any")
    np.testing.assert_array_equal(np.asarray(ga.hit), np.asarray(ra.hit))
