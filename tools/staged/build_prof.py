"""Stage profile of the on-device LBVH build at 5.24M tris (VERDICT r5 item 1).

Times each build stage as its own jitted program with real readback sync and
varied inputs (tunnel result-cache hazard, PERF_NOTES r3).  Stages:

  bounds+morton | sort | perm-gathers | leaf bounds | karras | refit RMQ | collapse

Run: JAX_PLATFORMS=axon python tools/staged/build_prof.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rtk_tpu.builder.collapse import collapse_wide
from rtk_tpu.builder.lbvh import karras_topology, refit_ranges
from rtk_tpu.ops.morton import morton3d, scene_bounds, sort_by_morton
from rtk_tpu.scene import _leaf_bounds
from rtk_tpu.testing import scenes

P = lambda *a: (print(*a, flush=True), sys.stderr.flush())

LEAF = 8
SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 9


def timeit_stage(name, fn, variants, iters=3):
    # fn(variant) -> array(s); sync via np.asarray of first element.
    outs = fn(variants[0])
    first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first)[:1]  # warm compile + real readback
    t0 = time.perf_counter()
    for i in range(iters):
        outs = fn(variants[i % len(variants)])
        first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    P(f"  {name:14s} {dt*1e3:9.2f} ms")
    return dt


def main():
    P(f"devices: {jax.devices()}")
    tris = scenes.blob(subdivisions=SUB)[0]
    t = tris.shape[0]
    P(f"tris: {t}")
    nvar = 2
    tvars = [jax.block_until_ready(jnp.asarray(tris) + 1e-6 * i)
             for i in range(nvar)]

    # stage 1: bounds + morton
    @jax.jit
    def s_morton(tv):
        lo, hi = scene_bounds(tv)
        cent = jnp.mean(tv, axis=1)
        return morton3d(cent, lo, hi, bits=10)

    d1 = timeit_stage("morton", s_morton, tvars)
    codes_v = [jax.block_until_ready(s_morton(v)) for v in tvars]

    # stage 2: sort
    @jax.jit
    def s_sort(codes):
        return sort_by_morton(codes)

    d2 = timeit_stage("sort", s_sort, codes_v)
    sc_perm = [jax.block_until_ready(s_sort(c)) for c in codes_v]

    # stage 3: permutation gathers of the triangle payload
    @jax.jit
    def s_gather(tv, perm):
        return jnp.take(tv, perm, axis=0)

    d3 = timeit_stage("perm-gather-v", lambda i: s_gather(tvars[i], sc_perm[i][1]),
                      list(range(nvar)))

    @jax.jit
    def s_gather_meta(perm):
        a = jnp.take(jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3), perm, axis=0)
        b = jnp.take(jnp.zeros((t,), jnp.int32), perm)
        c = jnp.take(jnp.arange(t, dtype=jnp.int32), perm)
        d = jnp.take(sc_perm[0][0], perm)
        return a, b, c, d

    d3b = timeit_stage("perm-gather-m", lambda i: s_gather_meta(sc_perm[i][1]),
                       list(range(nvar)))

    sorted_v = [jax.block_until_ready(s_gather(tvars[i], sc_perm[i][1]))
                for i in range(nvar)]
    sorted_c = [jax.block_until_ready(jnp.take(sc_perm[i][0], jnp.arange(t)))
                for i in range(nvar)]

    # stage 4: leaf bounds
    @functools.partial(jax.jit, static_argnums=())
    def s_leafb(sv):
        return _leaf_bounds(sv, t, LEAF)

    d4 = timeit_stage("leaf-bounds", s_leafb, sorted_v)
    lb_v = [jax.block_until_ready(s_leafb(v)) for v in sorted_v]

    # stage 5: karras on cluster codes
    @jax.jit
    def s_karras(sc):
        return karras_topology(sc[::LEAF])

    d5 = timeit_stage("karras", s_karras, sorted_c)
    topo_v = [jax.block_until_ready(s_karras(c)) for c in sorted_c]

    # stage 6: refit ranges
    @jax.jit
    def s_refit(topo, lb):
        left, right, lo, hi = topo
        return refit_ranges(lo, hi, lb[0], lb[1])

    d6 = timeit_stage("refit-rmq", lambda i: s_refit(topo_v[i], lb_v[i]),
                      list(range(nvar)))
    bb_v = [jax.block_until_ready(s_refit(topo_v[i], lb_v[i]))
            for i in range(nvar)]

    # stage 7: collapse
    @jax.jit
    def s_collapse(topo, bb, lb):
        left, right, lo, hi = topo
        return collapse_wide(left, right, bb[0], bb[1], lb[0], lb[1], 8)

    d7 = timeit_stage("collapse", lambda i: s_collapse(topo_v[i], bb_v[i], lb_v[i]),
                      list(range(nvar)))

    total = d1 + d2 + d3 + d3b + d4 + d5 + d6 + d7
    P(f"  {'SUM':14s} {total*1e3:9.2f} ms  ({t/total/1e6:.1f} Mtris/s)")

    # end-to-end reference (fused single program, as bench measures)
    from rtk_tpu import BuildConfig
    from rtk_tpu.scene import build_from_soup
    cfg = BuildConfig(branching=8, leaf_size=LEAF)
    import itertools
    ctr = itertools.count()
    s = build_from_soup(tvars[0], config=cfg)
    np.asarray(s.node_min.ravel()[:1])
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        s = build_from_soup(tvars[next(ctr) % nvar], config=cfg)
    np.asarray(s.node_min.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    P(f"  {'E2E fused':14s} {dt*1e3:9.2f} ms  ({t/dt/1e6:.1f} Mtris/s)")


if __name__ == "__main__":
    main()
