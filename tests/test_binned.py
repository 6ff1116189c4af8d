"""Binned (re-binned) incoherent-ray engine: exact parity with the flat
packet engine (testing/binned.py; demoted from trace/ in r4 — loses to
the flat engine on TPU, PERF_NOTES r2/r4)."""
import pytest
import numpy as np

from rtk_tpu import build_scene
from rtk_tpu.config import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing.binned import subtree_bins, trace_packets_binned
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays


def _packed():
    tris = scenes.blob(subdivisions=3)[0]
    scene = build_scene(
        (tris.reshape(-1, 3), np.arange(tris.shape[0] * 3).reshape(-1, 3)),
        BuildConfig(branching=8, leaf_size=8))
    return pack_scene(scene)


@pytest.mark.smoke
def test_subtree_bins_cover_tree():
    packed = _packed()
    roots, lo, hi = subtree_bins(packed, 2)
    assert roots.shape[0] > 8
    assert (lo <= hi).all()
    # depth-1 cut = the root's children exactly
    r1, _, _ = subtree_bins(packed, 1)
    assert r1.shape[0] <= 8


def test_binned_matches_flat_closest_and_any():
    packed = _packed()
    rng = np.random.default_rng(3)
    n = 512
    rays = Rays.make(rng.normal(size=(n, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(n, 3)).astype(np.float32))
    ref = trace_packets(packed, rays, interpret=True)
    got = trace_packets_binned(packed, rays, interpret=True, depth=2,
                               max_candidates=4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    mism = np.asarray(got.slot) != np.asarray(ref.slot)
    if mism.any():  # engines may differ at exact-t ties only
        dt = np.abs(np.asarray(got.t)[mism] - np.asarray(ref.t)[mism])
        assert dt.max() == 0.0
    ga = trace_packets_binned(packed, rays, interpret=True, mode="any",
                              max_candidates=4)
    ra = trace_packets(packed, rays, interpret=True, mode="any")
    np.testing.assert_array_equal(np.asarray(ga.hit), np.asarray(ra.hit))


def test_binned_small_candidate_exactness_fallback():
    """C=1 forces heavy reliance on the residual full-tree pass — results
    must still be exact."""
    packed = _packed()
    rng = np.random.default_rng(11)
    rays = Rays.make(rng.normal(size=(256, 3)).astype(np.float32) * 0.5,
                     rng.normal(size=(256, 3)).astype(np.float32))
    ref = trace_packets(packed, rays, interpret=True)
    got = trace_packets_binned(packed, rays, interpret=True, depth=2,
                               max_candidates=1)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
