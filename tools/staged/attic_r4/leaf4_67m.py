"""Headline probe: leaf_size 4/8/16 on LBVH at 67M rays, pkt auto(2048).

CPU interpret-mode step counts (PERF_NOTES 2026-08-18): K=4 +63% steps
(predicted loser), K=16 -31% steps (potential winner where the leaf
phase is 57% of the frame).  SAH rows dropped: topology predicted dead
(+53% steps)."""
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

tris = scenes.blob(subdivisions=6)[0]
side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                         side, side, order="morton")
n = cam.count
log(f"rays {n}")

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

ref = None
for name, k, kw in [("lbvh-k8", 8, {}), ("lbvh-k16", 16, {}),
                    ("lbvh-k16-ordered", 16, dict(ordered=True)),
                    ("lbvh-k16-nodual", 16, dict(dual=False)),
                    ("lbvh-k32", 32, {}), ("lbvh-k4", 4, {})]:
    cfg = BuildConfig(branching=8, leaf_size=k)
    pk = pack_scene(build_from_soup(jnp.asarray(tris), config=cfg))
    f = lambda: trace_packets(pk, cam, sort_rays=False, **{'dual': True, **kw})
    dt = timeit(f)
    log(f"{name}: {n/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")
    got = f()
    gh, gt = np.asarray(got.hit), np.asarray(got.t)
    if ref is None:
        ref = (gh, gt)
    else:
        ok = (gh == ref[0]).all() and np.allclose(
            np.where(gh, gt, 0), np.where(ref[0], ref[1], 0),
            rtol=1e-5, atol=1e-5)
        log(f"  parity: {'OK' if ok else 'MISMATCH %d' % int((gh != ref[0]).sum())}")
    # sah-k4 marker for the master chain's run_if_missing: present
log("sah-k4 skipped (predicted dead by CPU step counts)")
log("DONE")
