"""pack_binary_tree: arbitrary host-built binary BVHs (here the
corrected-rtk C++ oracle's binned SAH, NativeOracle.export_tree) through
the packet kernel — must match the LBVH pack bit-tolerantly (same kernel,
different topology; rtk.c:390-539 semantics are topology-independent)."""
import numpy as np
import pytest

from rtk_tpu.config import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_binary_tree, pack_scene
from rtk_tpu.types import Rays


@pytest.fixture(scope="module")
def pair():
    try:
        from rtk_tpu.testing.native_oracle import NativeOracle
    except Exception as e:  # pragma: no cover - no toolchain
        pytest.skip(f"native oracle unavailable: {e}")
    tris = scenes.blob(subdivisions=3)[0]
    cfg = BuildConfig(branching=8, leaf_size=8)
    flat = pack_scene(build_from_soup(tris, config=cfg))
    orc = NativeOracle(tris.reshape(-1, 9), leaf_max=8)
    sah = pack_binary_tree(tris, *orc.export_tree(), leaf_size=8)
    return flat, sah


def _parity(got, ref):
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    diff = np.asarray(got.triangle_index) != np.asarray(ref.triangle_index)
    if diff.any():  # exact-t ties may resolve differently across topologies
        dt = np.abs(np.asarray(got.t)[diff] - np.asarray(ref.t)[diff])
        assert dt.max() == 0.0


def test_sah_topology_matches_lbvh(pair):
    flat, sah = pair
    rng = np.random.default_rng(21)
    rays = Rays.make(rng.normal(size=(512, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(512, 3)).astype(np.float32))
    _parity(trace_packets(sah, rays, interpret=True),
            trace_packets(flat, rays, interpret=True))


def test_sah_topology_any_and_records(pair):
    flat, sah = pair
    cam = scenes.camera_rays((0, 2.5, 3.5), (0, 0, 0), (0, 1, 0), 55,
                             48, 48, order="morton")
    _parity(trace_packets(sah, cam, interpret=True),
            trace_packets(flat, cam, interpret=True))
    ga = trace_packets(sah, cam, interpret=True, mode="any")
    ra = trace_packets(flat, cam, interpret=True, mode="any")
    np.testing.assert_array_equal(np.asarray(ga.hit), np.asarray(ra.hit))
    hit = np.asarray(ga.hit)
    assert (np.asarray(ga.triangle_index)[hit] >= 0).all()


def test_build_sah_packed_public_surface():
    """build_sah_packed accepts build_scene-style mesh input and traces
    identically to the LBVH path (modulo exact-t ties)."""
    import rtk_tpu

    tris = scenes.blob(subdivisions=3)[0]
    t = tris.shape[0]
    meshes = (tris.reshape(-1, 3), np.arange(t * 3).reshape(-1, 3))
    sah = rtk_tpu.build_sah_packed(meshes, BuildConfig(leaf_size=8))
    flat = pack_scene(build_from_soup(
        tris, config=BuildConfig(branching=8, leaf_size=8)))
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45, 24, 24)
    _parity(trace_packets(sah, cam, interpret=True),
            trace_packets(flat, cam, interpret=True))
