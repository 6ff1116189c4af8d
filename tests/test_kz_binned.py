"""kz-binned incoherent dispatch vs the flat engine (CPU interpret).

r5: trace_packets_kz_binned splits a mixed-direction batch into three
axis-pure sub-batches (one fused sort + one fused <=3-kernel program)
so each runs kz_static select-free leaf math.  Measured neutral on the
atrium bounce (1.75 vs 1.77, exact hit parity) — kept as a feature
path; this guards its exactness.
"""
import numpy as np

from rtk_tpu import BuildConfig, Rays, build_scene
from rtk_tpu.ops.pallas_trace import trace_packets, trace_packets_kz_binned
from rtk_tpu.testing import scenes
from rtk_tpu.trace.packed import pack_scene


def test_kz_binned_parity_incoherent():
    tris = scenes.blob(subdivisions=3)[0]
    scene = build_scene(
        (tris.reshape(-1, 3), np.arange(tris.shape[0] * 3).reshape(-1, 3)),
        BuildConfig(branching=8, leaf_size=8))
    packed = pack_scene(scene)
    rng = np.random.default_rng(9)
    n = 2000
    rays = Rays.make((rng.normal(size=(n, 3)) * 2).astype(np.float32),
                     rng.normal(size=(n, 3)).astype(np.float32))
    ref = trace_packets(packed, rays, interpret=True, sort_rays=True)
    got = trace_packets_kz_binned(packed, rays, pkt=128, p_pk=8,
                                  interpret=True)
    rh = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), rh)
    np.testing.assert_allclose(np.asarray(got.t)[rh],
                               np.asarray(ref.t)[rh], rtol=1e-6, atol=1e-6)
    same = rh & (np.asarray(got.triangle_index)
                 == np.asarray(ref.triangle_index))
    assert same.sum() / max(rh.sum(), 1) > 0.95
    # miss semantics: t == max_t, slot == -1
    miss = ~np.asarray(got.hit)
    np.testing.assert_allclose(np.asarray(got.t)[miss],
                               np.asarray(rays.max_t)[miss])
