"""Headline probe 3: kz_static at K=16 with leaf_flush scheduling fences.

sahq2 showed kz_static's select-free leaf chain lets Mosaic interleave
the K=16 unrolled triangle tests into 146.9M of register-spill slots
(OOM on the legacy table; 143 Mrays/s of spill traffic under tris128).
leaf_flush=F places an optimization_barrier on the hit carries every F
triangles — bounding the live set to ~F chains.  If the fences work,
K=16 + kz_static should recover the k8 ratio (+17%) on the 243.9 base.
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
    _ = np.asarray(out.t[:1])
    nh = int(np.asarray(out.hit).sum())
    best = float("inf")
    k = 0
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(cams[k % len(cams)])
            k += 1
        _ = np.asarray(out.t[:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, nh


orc = NativeOracle(tris.reshape(-1, 9), leaf_max=16, step_quant=True)
pk = pack_binary_tree(tris, *orc.export_tree(), leaf_size=16)
log("pack built")

variants = [
    ("kzs2+flush8 legacy", dict(kz_static=2, leaf_flush=8)),
    ("kzs2+flush8 t128", dict(kz_static=2, leaf_flush=8, tris128=True)),
    ("kzs2+flush4 t128", dict(kz_static=2, leaf_flush=4, tris128=True)),
    ("kzs2+flush2 t128", dict(kz_static=2, leaf_flush=2, tris128=True)),
    ("flush8 legacy (no kzs)", dict(leaf_flush=8)),
    ("base (ref)", dict()),
]
nh_ref = None
for name, kw in variants:
    try:
        f = lambda c: trace_packets(pk, c, sort_rays=False, dual=True,
                                    ordered=True, **kw)
        dt, nh = timeit(f)
        note = ""
        if nh_ref is None:
            nh_ref = nh
        elif nh != nh_ref:
            note = f"  HIT-COUNT DELTA {nh - nh_ref:+d}"
        log(f"sahq-k16-ordered+{name}: {n/dt/1e6:.1f} Mrays/s "
            f"({dt*1e3:.0f} ms, {nh} hits){note}")
    except Exception as e:
        log(f"sahq-k16-ordered+{name}: FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:120]}")
log("DONE sahq3_67m")
