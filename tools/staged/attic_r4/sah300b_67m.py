"""Lesion cost attribution on the sah-k16-ordered base (67M headline).

sah300_67m measured the noleaf ceiling at 486.6 Mrays/s (138 ms):
leaf phase ~141 ms of the 279 ms frame (~50%, vs 57% on lbvh-k8).
This probe sizes the leaf-phase components at the NEW operating point
(nodiv / noupdv / noselk / noslab lesions), re-times the base (probe 1's
base reading was a bogus 1 ms), and records step counts via stats=True.
"""
import time
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle

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


def timeit(f, iters=3, batches=3):
    out = f()
    jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16)
pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=16)

variants = [
    ("base", dict(dual=True)),
    ("base-again", dict(dual=True)),
    ("nodiv", dict(dual=True, lesion="nodiv")),
    ("noupdv", dict(dual=True, lesion="noupdv")),
    ("noselk", dict(dual=True, lesion="noselk")),
    ("noslab", dict(dual=True, lesion="noslab")),
    ("nondual-prune", dict(dual=False)),
]
for name, kw in variants:
    try:
        f = lambda: trace_packets(pk, cam, sort_rays=False, ordered=True,
                                  **kw)
        dt = timeit(f)
        log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")

# step counts on the base (stats=True runs its own kernel build)
try:
    hits, steps = trace_packets(pk, cam, sort_rays=False, dual=True,
                                ordered=True, stats=True)
    s = np.asarray(steps)
    log(f"steps/block: mean {s.mean():.1f} max {s.max()} "
        f"(blocks {s.size // (8 * 2048)})")
except Exception as e:
    log(f"stats: FAILED {type(e).__name__}: {e}")
log("DONE sah300b")
