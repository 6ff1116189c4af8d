"""AOT program export (utils/aot.py): serialize the compiled packet-trace
program, reload, and get bit-identical results with no Python retracing.

The data half of the serving story (scene blobs) is tests/test_serialize;
this covers the program half — together they mirror the reference's
"the blob is the runtime format" design (rtk.h:78-89) at the level a TPU
deployment needs it: shapes pinned, tables as arguments, StableHLO on
disk.
"""
import jax.numpy as jnp
import numpy as np

from rtk_tpu import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.utils.aot import export_packet_trace, load_packet_trace


def _packed(leaf_size=8):
    tris = scenes.cornell_box()
    return pack_scene(build_from_soup(
        jnp.asarray(tris),
        config=BuildConfig(branching=8, leaf_size=leaf_size)))


def test_aot_roundtrip_matches_direct():
    packed = _packed()
    rays = scenes.cornell_camera(32, 32)
    blob = export_packet_trace(packed, rays.count, interpret=True)
    lt = load_packet_trace(blob)
    assert lt.n_rays == rays.count
    got = lt(packed, rays)
    ref = trace_packets(packed, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    # Lazy hit assembly works off the caller's packed tables.
    np.testing.assert_array_equal(np.asarray(got.triangle_index),
                                  np.asarray(ref.triangle_index))


def test_aot_artifact_serves_refit_tables():
    """One artifact serves any scene with the same table shapes: trace a
    DEFORMED rebuild of the same topology through an artifact exported
    for the original (the refit-sequence serving pattern)."""
    rng = np.random.default_rng(3)
    base = scenes.cornell_box()
    packed0 = pack_scene(build_from_soup(
        jnp.asarray(base), config=BuildConfig(branching=8, leaf_size=8)))
    jig = base + rng.normal(scale=1e-3, size=base.shape).astype(np.float32)
    packed1 = pack_scene(build_from_soup(
        jnp.asarray(jig), config=BuildConfig(branching=8, leaf_size=8)))
    assert packed1.nodes.shape == packed0.nodes.shape
    rays = scenes.cornell_camera(16, 16)
    lt = load_packet_trace(
        export_packet_trace(packed0, rays.count, interpret=True))
    got = lt(packed1, rays)
    ref = trace_packets(packed1, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))


def test_aot_tpu_cross_lowering_serializes():
    """A TPU-lowered artifact exports from a CPU host (deployment: export
    in CI, run on the serving chip).  Callability needs a TPU, so this
    only checks the artifact round-trips the serializer."""
    packed = _packed()
    blob = export_packet_trace(packed, 1024, platforms=["tpu"], dual=True)
    lt = load_packet_trace(blob)
    assert lt.n_rays == 1024
