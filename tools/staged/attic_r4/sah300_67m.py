"""Headline push past 300 Mrays/s on the SAH topology (VERDICT r3 item 3).

sahk_67m measured sah-k16-ordered at 240.5 Mrays/s (vs lbvh-k8 163.8,
sah-k8 229).  This probe (a) re-runs the lesion attribution on the NEW
base — the r2 ceiling (373 with the leaf phase deleted) was computed on
LBVH-k8 and the leaf/rest split moves with ~40% fewer steps — and
(b) sweeps the levers whose LBVH-frame verdicts may flip: packet width,
leaf size 24, islab, prune-adjacent ordering variants.
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


def timeit(f, iters=3, batches=2):
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


packs = {}


def pack_sah(k):
    if k not in packs:
        orc = NativeOracle(tris.reshape(-1, 9), leaf_max=k)
        packs[k] = pack_binary_tree(tris, *orc.export_tree(), leaf_size=k)
    return packs[k]


ref = None
variants = [
    ("base-k16-ordered", 16, {}),
    ("noleaf-ceiling", 16, dict(lesion="noleaf")),
    ("pkt1024", 16, dict(pkt=1024)),
    ("pkt4096", 16, dict(pkt=4096)),
    ("islab-off", 16, dict(islab=False)),
    ("k24-ordered", 24, {}),
    ("k32-ordered", 32, {}),
]
for name, k, kw in variants:
    try:
        pk = pack_sah(k)
        kw = dict(ordered=True, **kw)
        f = lambda: trace_packets(pk, cam, sort_rays=False, dual=True, **kw)
        dt = timeit(f)
        log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
        if "lesion" in kw:
            continue  # lesioned output is wrong by design
        got = f()
        gh, gt = np.asarray(got.hit), np.asarray(got.t)
        if ref is None:
            ref = (gh, gt)
        else:
            both = gh & ref[0]
            n_mask = int((gh != ref[0]).sum())
            n_t = int((~np.isclose(gt[both], ref[1][both],
                                   rtol=1e-5, atol=1e-5)).sum())
            frac = (n_mask + n_t) / max(gh.size, 1)
            log(f"  parity: {'OK' if frac < 1e-5 else 'MISMATCH'} "
                f"(mask diff {n_mask}, t diff {n_t}, frac {frac:.2e})")
        del got, gh, gt
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {e}")
log("DONE sah300")
