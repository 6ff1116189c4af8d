"""Is jax.block_until_ready a real sync on the axon tunnel?

sah300b/c read 0-2 ms for 67M-ray traces whose step counts imply
~150-250 ms, with or without unique input bytes.  Hypothesis: dispatch
is async and block_until_ready returns at ENQUEUE, so timed loops
measure queue submission; a device->host readback of a value that
depends on the output is the only real sync.  This probe times the same
dispatch both ways, several times, at 16M rays.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.types import Rays

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


tris = scenes.blob(subdivisions=6)[0]
side = 4096
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         side, side, order="morton")
n = cam.count
log(f"rays {n}")

orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16)
pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=16)

cams = [Rays(origin=cam.origin, direction=cam.direction,
             min_t=jnp.full((n,), 1e-7 * (i + 1), jnp.float32),
             max_t=cam.max_t) for i in range(12)]

f = lambda c: trace_packets(pk, c, sort_rays=False, dual=True,
                            ordered=True)
out = f(cams[-1])
_ = np.asarray(out.t[:1])  # full warm-up incl. real completion
log("warm")

for i in range(4):
    t0 = time.perf_counter()
    out = f(cams[i])
    jax.block_until_ready(out.t)
    t1 = time.perf_counter()
    _ = np.asarray(out.t[:1])
    t2 = time.perf_counter()
    log(f"iter {i}: block_until_ready {1e3*(t1-t0):.1f} ms; "
        f"readback +{1e3*(t2-t1):.1f} ms "
        f"(-> {n/(t2-t0)/1e6:.1f} Mrays/s true)")
for i in range(4, 8):
    t0 = time.perf_counter()
    out = f(cams[i])
    _ = np.asarray(out.t[:1])
    t1 = time.perf_counter()
    log(f"iter {i}: readback-only {1e3*(t1-t0):.1f} ms "
        f"(-> {n/(t1-t0)/1e6:.1f} Mrays/s)")
log("DONE sync_probe")
