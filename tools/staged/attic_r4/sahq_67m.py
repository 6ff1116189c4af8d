"""Headline probe: step-quantized SAH topology x kz_static leaf phase.

Two independent levers on the sah-k16-ordered base (239.8 Mrays/s, 280 ms;
lesion: leaf phase 143 ms, sah300d):
  * sahq  — rtko_build3 step-quantized SAH (occupancy 0.97 vs 0.72, 26%
    fewer leaves/nodes; SA-weighted expected visits unchanged, so this
    may be neutral — the sahq_steps CPU predictor sizes it honestly).
  * kzs2  — batch-static shear axis (the headline camera is kz=2 uniform
    by construction): drops all 18 per-triangle axis selects with ONE
    identity-rotated VMEM table.

Timing hardened per PERF_NOTES r3 hazards (unique input bytes per
dispatch + 1-element readback sync).
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
for tag, k, sq in [("sah-k16", 16, False), ("sahq-k16", 16, True),
                   ("sahq-k8", 8, True)]:
    orc = NativeOracle(tris.reshape(-1, 9), leaf_max=k, step_quant=sq)
    packs[tag] = pack_binary_tree(tris, *orc.export_tree(), leaf_size=k)
log("packs built")

variants = [
    ("sah-k16-ordered (base)", "sah-k16", dict(ordered=True)),
    ("sah-k16-ordered+kzs2", "sah-k16", dict(ordered=True, kz_static=2)),
    ("sahq-k16-ordered", "sahq-k16", dict(ordered=True)),
    ("sahq-k16-ordered+kzs2", "sahq-k16", dict(ordered=True, kz_static=2)),
    ("sahq-k8-ordered+kzs2", "sahq-k8", dict(ordered=True, kz_static=2)),
    ("sahq-k8+kzs2", "sahq-k8", dict(kz_static=2)),
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
        log(f"{name}: FAILED {type(e).__name__}: {e}")
log("DONE sahq_67m")
