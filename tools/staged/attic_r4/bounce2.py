"""TPU probe: flat-engine bounce tuning on atrium 1M (r4, post-leaf_loop).

bounce_lesion established: flat dual leaf_loop 1.30 Mrays/s beats the
grid rounds engine's zero-bookkeeping ceiling (norank 1.15) — the flat
engine is the bounce path.  This probe tunes it: packet width (the r2
"512 best" verdict predates leaf_loop), ordered+prune (now works in
dual), leaf size (K=32's bigger tile is cheaper per row under
leaf_loop), tris128.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/bounce2.py
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

    packs = {}

    def pack_of(k):
        if k not in packs:
            orc = NativeOracle(atr.reshape(-1, 9), leaf_max=k,
                               step_quant=True)
            packs[k] = pack_binary_tree(atr, *orc.export_tree(),
                                        leaf_size=k)
            del orc
        return packs[k]

    packed16 = pack_of(16)
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                             1024, 1024, order="morton")
    prim = trace_packets(packed16, cam)
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

    n_hit_ref = None
    cands = [
        ("k16 loop (1.30 ref)", 16, dict(dual=True, leaf_loop=True)),
        ("k16 loop pkt1024", 16, dict(dual=True, leaf_loop=True, pkt=1024)),
        ("k16 loop pkt2048", 16, dict(dual=True, leaf_loop=True, pkt=2048)),
        ("k16 loop ordered", 16,
         dict(dual=True, leaf_loop=True, ordered=True)),
        ("k32 loop", 32, dict(dual=True, leaf_loop=True)),
        ("k32 loop pkt1024", 32, dict(dual=True, leaf_loop=True, pkt=1024)),
        ("k16 loop tris128", 16,
         dict(dual=True, leaf_loop=True, tris128=True)),
    ]
    for name, k, kw in cands:
        try:
            packed = pack_of(k)
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
