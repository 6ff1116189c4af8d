"""Dual pop-balance at the headline config (VERDICT r5 item 3 prereq).

stats lanes (r5): lane 0 = steps, lane 1 = internal pops, lane 2 =
leaf pops per block.  Dual steps ~= max(int, leaf) pops per packet —
W=16 nodes can only pay if INTERNAL pops bind (halving internal pops
would then cut steps); if leaf pops bind, the lever is leaf-side.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/hl2.py [side]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.trace.packed import pack_binary_tree


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    btris = scenes.blob(subdivisions=6)[0]
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton", device=True)
    orc = NativeOracle(btris.reshape(-1, 9), leaf_max=16, step_quant=True)
    packed = pack_binary_tree(btris, *orc.export_tree(), leaf_size=16)
    del orc
    kw = dict(ordered=True, defer_uv=True, dual=True, leaf_loop=True,
              kz_static=2, sort_rays=False)

    t0 = time.time()
    out, steps_dev = trace_packets(packed, rays, stats=True, **kw)
    steps = np.asarray(steps_dev)
    log(f"stats compile+run {time.time()-t0:.0f}s  "
        f"n_hit={int(np.asarray(out.hit).sum())}")
    blkw = 8 * 2048
    blk = steps.reshape(-1, blkw)
    st = blk[:, 0]
    ip = blk[:, 1]
    lp = blk[:, 2]
    log(f"blocks {st.size}")
    log(f"steps/block  mean {st.mean():.1f} p95 {np.percentile(st,95):.0f} "
        f"total {st.sum()}")
    log(f"int pops     mean {ip.mean():.1f} p95 {np.percentile(ip,95):.0f} "
        f"total {ip.sum()}")
    log(f"leaf pops    mean {lp.mean():.1f} p95 {np.percentile(lp,95):.0f} "
        f"total {lp.sum()}")
    # Which side binds per block: whichever pop total is the larger
    # share of the block's P*steps budget.
    int_bound = (ip > lp).mean()
    log(f"blocks internal-bound: {int_bound*100:.1f}%  "
        f"(int/leaf pop ratio {ip.sum()/max(lp.sum(),1):.2f})")


if __name__ == "__main__":
    main()
