"""Headline probe 2: tris128 VMEM layout x quantized SAH x kz_static.

sahq_67m round 1 results (PERF_NOTES pending):
  sah-k16-ordered 235.2; sahq-k16-ordered 243.9 (+3.7%, same hits);
  ALL kz_static variants OOMed at compile: the kz_static leaf path costs
  146.9M (k16) / 81.3M (k8) of register-spill slots, AND the (Tp, 16)
  VMEM table pads 16 lanes to 128 (55.75M for 7M logical bytes).
tris128 (this commit) removes the 8x table padding; this probe re-runs
the matrix in the freed budget.  k16+kzs2@pkt2048 is expected to still
OOM (spills alone exceed 128M) — kept to confirm; pkt1024 halves spills.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.ops.pallas_trace import trace_packets, uniform_kz
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
log(f"rays {n} (bench headline camera), uniform_kz={uniform_kz(cam)}")

cams = [Rays(origin=cam.origin, direction=cam.direction,
             min_t=jnp.full((n,), 1e-7 * (i + 1), jnp.float32),
             max_t=cam.max_t) for i in range(6)]


def timeit(f, iters=3, batches=2):
    out = f(cams[-1])
    _ = np.asarray(out.t[:1])  # real sync
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


packs = {}
for tag, k in [("sahq-k16", 16), ("sahq-k8", 8)]:
    orc = NativeOracle(tris.reshape(-1, 9), leaf_max=k, step_quant=True)
    packs[tag] = pack_binary_tree(tris, *orc.export_tree(), leaf_size=k)
log("packs built")

variants = [
    ("sahq-k16-ordered (t128 base)", "sahq-k16", dict(ordered=True)),
    ("sahq-k16-ordered+kzs2", "sahq-k16", dict(ordered=True, kz_static=2)),
    ("sahq-k16-ordered+kzs2 pkt1024", "sahq-k16",
     dict(ordered=True, kz_static=2, pkt=1024)),
    ("sahq-k8-ordered+kzs2", "sahq-k8", dict(ordered=True, kz_static=2)),
    ("sahq-k8+kzs2", "sahq-k8", dict(kz_static=2)),
    ("sahq-k8-ordered", "sahq-k8", dict(ordered=True)),
]
nh_ref = None
for name, ptag, kw in variants:
    try:
        pk = packs[ptag]
        f = lambda c: trace_packets(pk, c, sort_rays=False, dual=True, **kw)
        dt, nh = timeit(f)
        note = ""
        if nh_ref is None:
            nh_ref = nh
        elif nh != nh_ref:
            note = f"  HIT-COUNT DELTA {nh - nh_ref:+d}"
        log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms, "
            f"{nh} hits){note}")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:120]}")
log("DONE sahq2_67m")
