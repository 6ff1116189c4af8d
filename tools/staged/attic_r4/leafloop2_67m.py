"""TPU probe 2: retune leaf size / packet width on the r4 301-Mrays/s
config (sahq ordered dual defer_uv leaf_loop kz_static=2).

leaf_loop+kzs cut per-triangle leaf cost ~40%, which shifts the
K-vs-steps tradeoff leafward: K=24/32 buy ~-20/-30% steps at 1.5/2x
leaf tile that is now cheaper per row.  Also re-tests pkt=4096 and
P=4@4096 (the old verdicts predate the cheap leaf phase).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/leafloop2_67m.py
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

    def variants(m=6):
        base = jnp.asarray(rays.min_t)
        vs = [Rays(origin=rays.origin, direction=rays.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=rays.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    packs = {}

    def pack_of(k):
        if k not in packs:
            orc = NativeOracle(btris.reshape(-1, 9), leaf_max=k,
                               step_quant=True)
            packs[k] = pack_binary_tree(btris, *orc.export_tree(),
                                        leaf_size=k)
            del orc
        return packs[k]

    base_kw = dict(ordered=True, defer_uv=True, dual=True, leaf_loop=True,
                   kz_static=2)
    n_hit_ref = None
    cands = [
        ("k16 (301 ref)", 16, {}),
        ("k24", 24, {}),
        ("k32", 32, {}),
        ("k16 pkt4096", 16, dict(pkt=4096)),
        ("k16 p4 pkt4096", 16, dict(pkt=4096, p_pk=4)),
        ("k16 noislab", 16, dict(islab=False)),
    ]
    for name, k, extra in cands:
        kw = dict(base_kw, **extra)
        try:
            packed = pack_of(k)
            t0 = time.time()
            out = trace_packets(packed, rays, sort_rays=False, **kw)
            nh = int(np.asarray(out.hit).sum())
            log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
            if n_hit_ref is None:
                n_hit_ref = nh
            elif nh != n_hit_ref:
                log(f"{name}: HIT-COUNT MISMATCH vs {n_hit_ref}")
            del out
            nxt = variants()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(3):
                    o = trace_packets(packed, nxt(), sort_rays=False, **kw)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 3)
            log(f"{name}: {best*1e3:.1f} ms -> "
                f"{rays.count/best/1e6:.1f} Mrays/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
