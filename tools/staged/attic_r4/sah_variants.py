"""REPURPOSED (was sah-variants; CPU step-count predictor killed SAH:
PERF_NOTES 2026-08-18): refit-frame breakdown, VERDICT r1 item 5.

Deforming config: 18,432 tris, 256^2 rays, 13.1 ms/frame fused.  Where
does it go?  refit fixpoint | repack gathers | trace kernel | dispatch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.config import BuildConfig
from rtk_tpu.scene import build_from_soup, refit as scene_refit
from rtk_tpu.trace.packed import pack_scene, repack_bounds
from rtk_tpu.ops.pallas_trace import (trace_packets, trace_packets_refit,
                                      trace_packets_refit_frames)
from rtk_tpu.testing import scenes

T0 = time.perf_counter()
def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)

def timeit(f, leaf=None, iters=10, batches=3):
    out = f()
    jax.block_until_ready(jax.tree.leaves(out)[0] if leaf is None else leaf(out))
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(jax.tree.leaves(out)[0] if leaf is None else leaf(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

cfg = BuildConfig(branching=8, leaf_size=8)
grid0 = scenes.deforming_grid(0.0, n=96)
scene_d = build_from_soup(jnp.asarray(grid0), config=cfg)
packed_d = pack_scene(scene_d)
frame1 = jnp.asarray(scenes.deforming_grid(0.1, n=96))
cam = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 256, 256,
                         order="morton")
log(f"tris {grid0.shape[0]} rays {cam.count}")

# dispatch floor: trivial jitted op
tiny = jnp.ones((8, 128), jnp.float32)
f0 = jax.jit(lambda x: x + 1.0)
log(f"dispatch floor (jit add): {timeit(lambda: f0(tiny))*1e3:.2f} ms")

# refit only
rf = jax.jit(lambda s, p: scene_refit(s, p))
log(f"refit only: {timeit(lambda: rf(scene_d, frame1), leaf=lambda s: s.bin_min)*1e3:.2f} ms")

# refit + repack
rrp = jax.jit(lambda s, p, pk: repack_bounds(pk, scene_refit(s, p)))
log(f"refit+repack: {timeit(lambda: rrp(scene_d, frame1, packed_d), leaf=lambda pk: pk.nodes)*1e3:.2f} ms")

# trace only (static tables)
log(f"trace only: {timeit(lambda: trace_packets(packed_d, cam, sort_rays=False), leaf=lambda h: h.t)*1e3:.2f} ms")

# fused single-frame
log(f"fused refit+trace: {timeit(lambda: trace_packets_refit(packed_d, scene_d, frame1, cam, sort_rays=False)[0], leaf=lambda h: h.t)*1e3:.2f} ms")

# scan executor at several F
for F in (4, 8, 16):
    clip = jnp.stack([jnp.asarray(scenes.deforming_grid(0.05 * i, n=96))
                      for i in range(F)])
    dt = timeit(lambda: trace_packets_refit_frames(
        packed_d, scene_d, clip, cam, sort_rays=False)[-1],
        leaf=lambda h: h.t, iters=3, batches=2)
    log(f"scan x{F}: {dt/F*1e3:.2f} ms/frame ({dt*1e3:.0f} ms total)")
log("DONE refit breakdown")
