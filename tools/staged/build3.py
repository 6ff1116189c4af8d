"""Build rebuild probe 2: payload movement + assembly + collapse variants.

build2 verdicts: SoA elementwise ~free (morton 9 ms, leafb 16 ms),
karras-scan 45 ms, sort(2op) 21 ms; 1-D gathers cost ~22 ns/ELEMENT and
row gathers ~80 ns/ROW, so the payload permutation is the elephant.
This probe decides HOW the payload moves to sorted order:

  sort-2 / sort-8 / sort-17: lax.sort operand scaling (payload as extra
    sort operands vs post-sort gathers)
  gather-rows-3x3: the (T,3,3) row-gather baseline (415 ms in prof1)
  split / assemble: (T,3,3) <-> 9x(T,) conversion cost at the jit
    boundary (Scene contract keeps (T,3,3) outputs)
  collapse-flat: slot bounds via ONE (Li*8)-row gather from a fused
    (Li+L+1, 6) bounds table (empty slot = sentinel row) vs the 6
    per-component gathers

Run: JAX_PLATFORMS=axon python tools/staged/build3.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rtk_tpu.builder.lbvh import karras_topology_scan
from rtk_tpu.ops.morton import sort_by_morton
from rtk_tpu.testing import scenes

P = lambda *a: print(*a, flush=True)
LEAF = 8
SUB = int(sys.argv[1]) if len(sys.argv) > 1 else 9


def timeit_stage(name, fn, variants, iters=3):
    outs = fn(variants[0])
    first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first.ravel()[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        outs = fn(variants[(i + 1) % len(variants)])
        first = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(first.ravel()[:1])
    dt = (time.perf_counter() - t0) / iters
    P(f"  {name:18s} {dt*1e3:9.2f} ms")
    return dt


def main():
    P(f"devices: {jax.devices()}")
    tris = scenes.blob(subdivisions=SUB)[0]
    t = tris.shape[0]
    L = t // LEAF
    P(f"tris: {t}")
    nvar = 2
    aos_v = [jax.block_until_ready(jnp.asarray(tris + 1e-6 * i))
             for i in range(nvar)]
    soa_v = []
    for i in range(nvar):
        th = tris + 1e-6 * i
        soa_v.append([jax.block_until_ready(jnp.asarray(
            np.ascontiguousarray(th[:, a, c])))
            for a in range(3) for c in range(3)])
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 2**30, size=t).astype(np.uint32)
    codes_v = [jax.block_until_ready(jnp.asarray(codes_np + i))
               for i in range(nvar)]

    # 1) split: (T,3,3) -> 9 x (T,)
    @jax.jit
    def s_split(a):
        return [a[:, i, c] for i in range(3) for c in range(3)]

    timeit_stage("split-aos->soa", s_split, aos_v)

    # 2) assemble: 9 x (T,) -> (T,3,3)
    @jax.jit
    def s_assemble(*comps):
        return jnp.stack([jnp.stack(comps[3*i:3*i+3], axis=1)
                          for i in range(3)], axis=1)

    timeit_stage("assemble-soa->aos", lambda v: s_assemble(*v), soa_v)

    # 3) sort operand scaling
    @jax.jit
    def s_sort2(c):
        i = jnp.arange(t, dtype=jnp.int32)
        return jax.lax.sort((c, i), num_keys=2)

    timeit_stage("sort-2op", s_sort2, codes_v)

    @jax.jit
    def s_sort8(c, *comps):
        i = jnp.arange(t, dtype=jnp.int32)
        return jax.lax.sort((c, i) + comps[:6], num_keys=2)

    timeit_stage("sort-8op", lambda i: s_sort8(codes_v[i], *soa_v[i]),
                 list(range(nvar)))

    @jax.jit
    def s_sort17(c, *comps):
        i = jnp.arange(t, dtype=jnp.int32)
        extra = (jnp.zeros((t,), jnp.int32),) * 6  # vidx x3 + mesh + prim...
        return jax.lax.sort((c, i) + comps + extra, num_keys=2)

    timeit_stage("sort-17op", lambda i: s_sort17(codes_v[i], *soa_v[i]),
                 list(range(nvar)))

    # 4) gather baselines
    perm_v = [jax.block_until_ready(s_sort2(c)[1]) for c in codes_v]

    @jax.jit
    def s_gather_rows(a, perm):
        return jnp.take(a, perm, axis=0)

    timeit_stage("gather-rows-3x3",
                 lambda i: s_gather_rows(aos_v[i], perm_v[i]),
                 list(range(nvar)))

    @jax.jit
    def s_gather_rows9(a, perm):
        return jnp.take(a.reshape(t, 9), perm, axis=0)

    timeit_stage("gather-rows-9",
                 lambda i: s_gather_rows9(aos_v[i], perm_v[i]),
                 list(range(nvar)))

    @jax.jit
    def s_scatter_rows9(a, perm):
        out = jnp.zeros((t, 9), jnp.float32)
        return out.at[perm].set(a.reshape(t, 9))

    timeit_stage("scatter-rows-9",
                 lambda i: s_scatter_rows9(aos_v[i], perm_v[i]),
                 list(range(nvar)))

    # 5) collapse variants on a real topology
    sc = jnp.sort(codes_v[0])[::LEAF]
    topo = jax.block_until_ready(karras_topology_scan(sc))
    left, right, lo, hi = topo
    Li = left.shape[0]
    nb_v = [tuple(jax.block_until_ready(jnp.asarray(
        rng.normal(size=(Li,)).astype(np.float32) + i)) for _ in range(6))
        for i in range(nvar)]
    lb_v = [tuple(jax.block_until_ready(jnp.asarray(
        rng.normal(size=(L,)).astype(np.float32) + i)) for _ in range(6))
        for i in range(nvar)]

    from rtk_tpu.builder.collapse import collapse_wide

    @jax.jit
    def s_collapse_old(nb, lb):
        nmin = jnp.stack(nb[:3], 1)
        nmax = jnp.stack(nb[3:], 1)
        lmin = jnp.stack(lb[:3], 1)
        lmax = jnp.stack(lb[3:], 1)
        return collapse_wide(left, right, nmin, nmax, lmin, lmax, 8)

    timeit_stage("collapse-old",
                 lambda i: s_collapse_old(nb_v[i], lb_v[i]),
                 list(range(nvar)))

    @jax.jit
    def s_collapse_flat(nb, lb):
        # expand 3 levels (14 x 1-D takes), then ONE row gather from a
        # fused (Li + L + 1, 6) bounds table; sentinel row = empty.
        def take_i(a, idx):
            return jnp.take(a, idx)

        i = jnp.arange(Li, dtype=jnp.int32)
        slots = [take_i(left, i), take_i(right, i)]
        for _ in range(2):
            out = []
            for s in slots:
                internal = s >= 0
                si = jnp.clip(s, 0, Li - 1)
                out.append(jnp.where(internal, take_i(left, si), s))
                out.append(jnp.where(internal, take_i(right, si), -1))
            slots = out
        src = jnp.stack(slots, axis=1)  # (Li, 8)
        bounds = jnp.stack(
            [jnp.concatenate([nb[c], lb[c],
                              jnp.full((1,), 1.0 if c < 3 else -1.0,
                                       jnp.float32)])
             for c in range(6)], axis=1)  # (Li+L+1, 6)
        internal = src >= 0
        leaf = src <= -2
        row = jnp.where(internal, src,
                        jnp.where(leaf, Li + (-src - 2), Li + L))
        g = jnp.take(bounds, row.reshape(-1), axis=0).reshape(Li, 8, 6)
        return src, g

    timeit_stage("collapse-flat",
                 lambda i: s_collapse_flat(nb_v[i], lb_v[i]),
                 list(range(nvar)))


if __name__ == "__main__":
    main()
