"""TPU probe: device step counts + lesion attribution of the r4 301-Mrays/s
headline config (sahq-k16-ordered, dual, defer_uv, leaf_loop, kz_static=2),
to size the remaining per-step pools (scalar pop chain a*P, fixed cost c,
leaf bulk) for the next attack.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/hl_stats.py
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.types import Rays


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    side = 8192
    btris = scenes.blob(subdivisions=6)[0]
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton")
    orc = NativeOracle(btris.reshape(-1, 9), leaf_max=16, step_quant=True)
    packed = pack_binary_tree(btris, *orc.export_tree(), leaf_size=16)
    del orc
    kw = dict(ordered=True, defer_uv=True, dual=True, leaf_loop=True,
              kz_static=2, sort_rays=False)

    # Device step counts (stats=True adds an out ref; separate compile).
    t0 = time.time()
    out, steps_dev = trace_packets(packed, rays, stats=True, **kw)
    steps = np.asarray(steps_dev)
    log(f"stats compile+run {time.time()-t0:.0f}s  "
        f"n_hit={int(np.asarray(out.hit).sum())}")
    # steps is per-ray = its block's step count; one entry per block:
    blk = steps.reshape(-1, 8 * 2048)[:, 0]
    log(f"blocks {blk.size}  steps/block mean {blk.mean():.1f} "
        f"p50 {np.percentile(blk, 50):.0f} p95 {np.percentile(blk, 95):.0f} "
        f"max {blk.max()}  total {blk.sum()}")

    # Lesion wall-times on the same config (WRONG RESULTS, timing only).
    def vary(m=4):
        base = jnp.asarray(rays.min_t)
        vs = [Rays(origin=rays.origin, direction=rays.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=rays.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    for name, les in (("base", None), ("noleaf", "noleaf"),
                      ("noslab", "noslab")):
        try:
            o = trace_packets(packed, rays, lesion=les, **kw)
            np.asarray(o.t[:1])
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(3):
                    o = trace_packets(packed, nxt(), lesion=les, **kw)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 3)
            log(f"{name}: {best*1e3:.1f} ms -> "
                f"{rays.count/best/1e6:.1f} Mrays/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
