"""Cache-busted lesion attribution on sah-k16-ordered (67M headline).

sah300b's readings were ~1 ms: the axon terminal serves REPEATED
IDENTICAL dispatches from a result cache, so best-of-batches timing on
fixed inputs measures the cache, not the kernel (probe evidence: the
'base' run read 1 ms while bit-exact variants read ~300 ms, and the
measured 10.1 steps/block implies ~200 ms of real work).  Here every
timed iteration perturbs min_t by a semantically-dead epsilon so each
dispatch has unique input bytes.  First two variants measure the SAME
config with fixed vs varied inputs to confirm the cache hypothesis.
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

# 6 pre-built ray batches differing by a dead epsilon in min_t (rays
# start at min_t=0; epsilon stays far below any hit t).
cams = [Rays(origin=cam.origin, direction=cam.direction,
             min_t=jnp.full((n,), 1e-7 * (i + 1), jnp.float32),
             max_t=cam.max_t) for i in range(6)]


def timeit_fixed(f, iters=3, batches=2):
    out = f(cam)
    jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(cam)
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def timeit_varied(f, iters=3, batches=2):
    out = f(cams[-1])
    jax.block_until_ready(out.t)
    best = float("inf")
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(cams[k % len(cams)])
            k += 1
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16)
pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=16)

variants = [
    ("base-FIXED-args", dict(dual=True), timeit_fixed),
    ("base-varied", dict(dual=True), timeit_varied),
    ("noleaf", dict(dual=True, lesion="noleaf"), timeit_varied),
    ("nodiv", dict(dual=True, lesion="nodiv"), timeit_varied),
    ("noupdv", dict(dual=True, lesion="noupdv"), timeit_varied),
    ("noselk", dict(dual=True, lesion="noselk"), timeit_varied),
    ("noslab", dict(dual=True, lesion="noslab"), timeit_varied),
    ("nondual-prune", dict(dual=False), timeit_varied),
]
for name, kw, tfn in variants:
    try:
        f = lambda c: trace_packets(pk, c, sort_rays=False, ordered=True,
                                    **kw)
        dt = tfn(f)
        log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")
log("DONE sah300c")
