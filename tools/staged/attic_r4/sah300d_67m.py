"""Lesion cost attribution on sah-k16-ordered, measurement-hardened.

Supersedes sah300b/c, whose readings were poisoned by the tunnel's
transient enqueue-level block_until_ready (PERF_NOTES r3 measurement
hazard).  Every timed call here has unique input bytes AND the loop
syncs with a 1-element readback.
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
log(f"tris {tris.shape[0]}")

side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         side, side, order="morton")
n = cam.count
log(f"rays {n} (bench headline camera)")

cams = [Rays(origin=cam.origin, direction=cam.direction,
             min_t=jnp.full((n,), 1e-7 * (i + 1), jnp.float32),
             max_t=cam.max_t) for i in range(6)]


def timeit(f, iters=3, batches=2):
    out = f(cams[-1])
    _ = np.asarray(out.t[:1])  # real sync
    best = float("inf")
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(cams[k % len(cams)])
            k += 1
        _ = np.asarray(out.t[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16)
pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=16)

variants = [
    ("base", dict(dual=True)),
    ("noleaf", dict(dual=True, lesion="noleaf")),
    ("nodiv", dict(dual=True, lesion="nodiv")),
    ("noupdv", dict(dual=True, lesion="noupdv")),
    ("noslab", dict(dual=True, lesion="noslab")),
    ("nondual-prune", dict(dual=False)),
    # P=16: half the blocks at the same pkt — wins iff the step cost is
    # not fully serialized on the per-packet scalar chain (r1 measured
    # P=16 dead at pkt=128; untested at 2048).
    ("p16", dict(dual=True, p_pk=16)),
]
for name, kw in variants:
    try:
        f = lambda c: trace_packets(pk, c, sort_rays=False, ordered=True,
                                    **kw)
        dt = timeit(f)
        log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")
log("DONE sah300d")
