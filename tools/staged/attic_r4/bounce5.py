"""TPU probe: atrium 1M bounce — P x pkt sweep completion.  bounce4
found pkt256+P=16 at 1.76 Mrays/s (vs 1.52 at P=8): more packets per
block re-amortise the fixed step cost that narrow packets gave back.
Finish the grid: P=32, and pkt128 at high P.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/bounce5.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import Rays
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    atr = scenes.atrium()
    orc = NativeOracle(atr.reshape(-1, 9), leaf_max=16, step_quant=True)
    packed = pack_binary_tree(atr, *orc.export_tree(), leaf_size=16)
    del orc
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                             1024, 1024, order="morton")
    prim = trace_packets(packed, cam)
    n = geometric_normal(prim, cam.direction)
    bounce = Rays(
        origin=prim.position() + 1e-3 * n,
        direction=cosine_sample(jax.random.PRNGKey(0), n),
        min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
        max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    N = cam.count

    def vary(m=6):
        base = jnp.asarray(bounce.min_t)
        vs = [Rays(origin=bounce.origin, direction=bounce.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=bounce.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    base = dict(dual=True, leaf_loop=True, ordered=True, defer_uv=True)
    n_hit_ref = None
    for name, extra in (("pkt256 p16 (1.76 ref)", dict(pkt=256, p_pk=16)),
                        ("pkt256 p32", dict(pkt=256, p_pk=32)),
                        ("pkt128 p16", dict(pkt=128, p_pk=16)),
                        ("pkt128 p32", dict(pkt=128, p_pk=32)),
                        ("pkt512 p16", dict(pkt=512, p_pk=16))):
        kw = dict(base, **extra)
        try:
            t0 = time.time()
            out = trace_packets(packed, bounce, **kw)
            nh = int(np.asarray(out.hit).sum())
            log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
            if n_hit_ref is None:
                n_hit_ref = nh
            elif nh != n_hit_ref:
                log(f"{name}: HIT-COUNT MISMATCH vs {n_hit_ref}")
            del out
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    o = trace_packets(packed, nxt(), **kw)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            log(f"{name}: {best:.3f}s -> {N/best/1e6:.2f} Mrays/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
