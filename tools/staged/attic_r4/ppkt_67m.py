"""(P, PKT) sweep at the 67M bench headline — the round-1 sweep that
picked (8, 2048) ran at 1M rays; the optimum may shift at 64x the batch."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.config import BuildConfig
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes

T0 = time.perf_counter()
def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)

cfg = BuildConfig(branching=8, leaf_size=8)
tris = scenes.blob(subdivisions=6)[0]
packed = pack_scene(build_from_soup(jnp.asarray(tris), config=cfg))
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         8192, 8192, order="morton")
n = cam.count
log(f"rays {n} (bench camera)")

def timeit(f, iters=3, batches=2):
    out = f(); jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

for p, pkt in [(8, 2048), (4, 2048), (16, 2048), (4, 4096), (8, 1024)]:
    try:
        dt = timeit(lambda: trace_packets(packed, cam, sort_rays=False,
                                          dual=True, p_pk=p, pkt=pkt))
        log(f"P={p} pkt={pkt}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
    except Exception as e:
        log(f"P={p} pkt={pkt}: FAILED {type(e).__name__}: {e}")
# lesion upper bounds: defer u/v updates + the rcp divide to an epilogue?
for les in ("noupdv", "nodiv", "noupdv,nodiv"):
    dt = timeit(lambda: trace_packets(packed, cam, sort_rays=False,
                                      dual=True, lesion=les))
    log(f"lesion {les}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
log("DONE")
