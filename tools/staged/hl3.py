"""TPU probe: W=16 node tables at the 67M headline (+ atrium bounce).

hl2 measured the dual pop balance at the r4 headline config: internal
pops bind in 97.7% of blocks (ratio 2.6:1), so wider nodes cut the
binding pop count.  W=16 collapse is one level shallower per pop
(~log16 vs log8 depth); the slab tile doubles (vector, cheap) and the
ordered descent uses a 63-comparator Batcher network.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/hl3.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import Rays
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.trace.packed import pack_binary_tree


def log(m):
    print(m, file=sys.stderr, flush=True)


def vary_of(rays, m=6):
    base = jnp.asarray(rays.min_t)
    vs = [Rays(origin=rays.origin, direction=rays.direction,
               min_t=base + jnp.float32(1e-7) * (i + 1),
               max_t=rays.max_t) for i in range(m)]
    i = [0]

    def nxt():
        i[0] += 1
        return vs[i[0] % m]
    return nxt


def bench_one(name, packed, rays, iters=3, **kw):
    try:
        t0 = time.time()
        h = trace_packets(packed, rays, sort_rays=False, **kw)
        nh = int(np.asarray(h.hit).sum())
        log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
        nxt = vary_of(rays)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = trace_packets(packed, nxt(), sort_rays=False, **kw)
            np.asarray(o.t[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        n = rays.count
        log(f"{name}: {best*1e3:.0f} ms ({n/best/1e6:.2f} Mrays/s)")
        return nh
    except Exception as e:
        import traceback
        log(f"{name}: FAILED {type(e).__name__}: {e}")
        traceback.print_exc(file=sys.stderr)
        return None


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if which == "headline":
        btris = scenes.blob(subdivisions=6)[0]
        orc = NativeOracle(btris.reshape(-1, 9), leaf_max=16,
                           step_quant=True)
        tree = orc.export_tree()
        del orc
        rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                                  8192, 8192, order="morton", device=True)
        kw = dict(ordered=True, defer_uv=True, dual=True, leaf_loop=True,
                  kz_static=2)
        p16 = pack_binary_tree(btris, *tree, leaf_size=16, branching=16)
        nh16 = bench_one("W16 sahq-k16-ordered-kzs-loop [expect 41019795]",
                         p16, rays, **kw)
        del p16
        p8 = pack_binary_tree(btris, *tree, leaf_size=16)
        bench_one("W8 control (301 ref)", p8, rays, **kw)
    else:
        atr = scenes.atrium()
        orc = NativeOracle(atr.reshape(-1, 9), leaf_max=16,
                           step_quant=True)
        tree = orc.export_tree()
        del orc
        cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                                 1024, 1024, order="morton")
        p8 = pack_binary_tree(atr, *tree, leaf_size=16)
        prim = trace_packets(p8, cam)
        from rtk_tpu.models.path import cosine_sample, geometric_normal
        key = jax.random.PRNGKey(0)
        nrm = geometric_normal(prim, cam.direction)
        bounce = Rays(
            origin=prim.position() + 1e-3 * nrm,
            direction=cosine_sample(key, nrm),
            min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
            max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
        kwb = dict(dual=True, leaf_loop=True, ordered=True, defer_uv=True,
                   pkt=256, p_pk=16)
        p16 = pack_binary_tree(atr, *tree, leaf_size=16, branching=16)
        bench_one("W16 atrium bounce (1.77 ref)", p16, bounce, iters=2,
                  **kwb)
        bench_one("W8 atrium bounce control", p8, bounce, iters=2, **kwb)


if __name__ == "__main__":
    main()
