"""Refit probe: hoisted-sort scan executor + F sweep toward <=6 ms/frame.

The r3 re-baseline read the 8-frame scan at 8.5 ms/frame amortised
(VERDICT r2 item 5 target: <=6).  Two levers measured here:
  * the hoisted coherence sort (sort once outside the lax.scan instead
    of per frame, un-permute outputs once at the end);
  * clip length F (8 vs 16 vs 32) — the scan amortises the fixed
    dispatch + prep cost over more frames.

Run (ONE TPU process at a time):
    python tools/staged/refit6_tpu.py
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from rtk_tpu import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets_refit_frames
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


bench._enable_compile_cache()
cfg = BuildConfig(branching=8, leaf_size=8)
grid0 = scenes.deforming_grid(0.0, n=96)  # 18,432 tris
scene_d = build_from_soup(jnp.asarray(grid0), config=cfg)
packed_d = pack_scene(scene_d)
cam = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 256, 256,
                         order="morton")
nxt = bench.vary_rays(cam)
log(f"scene {grid0.shape[0]} tris, rays {cam.count}")

for F in (8, 16, 32):
    clip = jnp.stack([jnp.asarray(scenes.deforming_grid(0.05 * i, n=96))
                      for i in range(F)])
    dt = bench.timeit(lambda: trace_packets_refit_frames(
        packed_d, scene_d, clip, nxt(), sort_rays=True)[-1],
        iters=3, batches=2)
    log(f"F={F}: {dt/F*1e3:.2f} ms/frame amortised "
        f"({grid0.shape[0]*F/dt/1e6:.1f} Mtris/s, clip total {dt*1e3:.0f} ms)")

# sort_rays=False control at F=8: how much of the frame is the sort path?
clip = jnp.stack([jnp.asarray(scenes.deforming_grid(0.05 * i, n=96))
                  for i in range(8)])
dt = bench.timeit(lambda: trace_packets_refit_frames(
    packed_d, scene_d, clip, nxt(), sort_rays=False)[-1],
    iters=3, batches=2)
log(f"F=8 sort_rays=False: {dt/8*1e3:.2f} ms/frame")
log("DONE refit6")
