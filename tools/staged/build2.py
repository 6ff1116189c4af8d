"""Layout experiments for the gather-light build (r5 item 1).

build_prof.py showed ~300-450 ms for ELEMENTWISE stages over (T,3,3)
arrays at 5.24M tris — consistent with TPU minor-dim padding (3->128
lanes), not gather cost (lax.sort measured 21.9 ms).  This probe times
SoA variants of each stage.

Run: JAX_PLATFORMS=axon python tools/staged/build2.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from rtk_tpu.builder.lbvh import (karras_topology, karras_topology_scan,
                                  refit_ranges, refit_ranges_flat)
from rtk_tpu.ops.morton import morton3d, sort_by_morton
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
    tris = scenes.blob(subdivisions=SUB)[0]  # (T,3,3) host
    t = tris.shape[0]
    L = t // LEAF
    P(f"tris: {t}  leaves: {L}")
    nvar = 2
    # SoA: 9 component arrays per variant
    soa_v = []
    for i in range(nvar):
        th = tris + 1e-6 * i
        soa_v.append([jax.block_until_ready(jnp.asarray(th[:, a, c]))
                      for a in range(3) for c in range(3)])

    # a) morton from SoA comps (centroid + bounds + code, all (T,))
    @jax.jit
    def s_morton_soa(*comps):
        cx = (comps[0] + comps[3] + comps[6]) * (1.0 / 3.0)
        cy = (comps[1] + comps[4] + comps[7]) * (1.0 / 3.0)
        cz = (comps[2] + comps[5] + comps[8]) * (1.0 / 3.0)
        lo = jnp.stack([jnp.min(jnp.minimum(jnp.minimum(comps[c], comps[3+c]), comps[6+c]))
                        for c in range(3)])
        hi = jnp.stack([jnp.max(jnp.maximum(jnp.maximum(comps[c], comps[3+c]), comps[6+c]))
                        for c in range(3)])
        cent = jnp.stack([cx, cy, cz], axis=1)
        return morton3d(cent, lo, hi, bits=10)

    timeit_stage("morton-soa", lambda v: s_morton_soa(*v), soa_v)

    # a2) morton fully-1D (avoid the (T,3) stack: inline quantise)
    @jax.jit
    def s_morton_1d(*comps):
        from rtk_tpu.ops.morton import expand_bits10
        cs = []
        for c in range(3):
            cc = (comps[c] + comps[3+c] + comps[6+c]) * (1.0 / 3.0)
            lo = jnp.min(jnp.minimum(jnp.minimum(comps[c], comps[3+c]), comps[6+c]))
            hi = jnp.max(jnp.maximum(jnp.maximum(comps[c], comps[3+c]), comps[6+c]))
            q = jnp.clip((cc - lo) / jnp.maximum(hi - lo, 1e-30) * 1023.0,
                         0.0, 1023.0).astype(jnp.uint32)
            cs.append(expand_bits10(q))
        return (cs[0] << 2) | (cs[1] << 1) | cs[2]

    timeit_stage("morton-1d", lambda v: s_morton_1d(*v), soa_v)
    codes_v = [jax.block_until_ready(s_morton_1d(*v)) for v in soa_v]

    @jax.jit
    def s_sort(codes):
        return sort_by_morton(codes)

    timeit_stage("sort", s_sort, codes_v)
    perm_v = [jax.block_until_ready(s_sort(c))[1] for c in codes_v]

    # c) payload gather: 9 x (T,) takes + meta
    @jax.jit
    def s_gather_soa(perm, *comps):
        outs = [jnp.take(c, perm) for c in comps]
        vidx = [jnp.take(jnp.arange(t * 3, dtype=jnp.int32) * 1, perm * 3 + k)
                for k in range(1)]  # representative single meta gather
        return outs, vidx

    timeit_stage("gather-soa-9x1d",
                 lambda i: s_gather_soa(perm_v[i], *soa_v[i]),
                 list(range(nvar)))

    sorted_v = [jax.block_until_ready(s_gather_soa(perm_v[i], *soa_v[i]))[0]
                for i in range(nvar)]

    # d) leaf bounds from sorted SoA comps: (L, K) reshape reduce
    @jax.jit
    def s_leafb_soa(*comps):
        mins, maxs = [], []
        for c in range(3):
            m = jnp.minimum(jnp.minimum(comps[c], comps[3+c]), comps[6+c])
            M = jnp.maximum(jnp.maximum(comps[c], comps[3+c]), comps[6+c])
            mins.append(jnp.min(m.reshape(L, LEAF), axis=1))
            maxs.append(jnp.max(M.reshape(L, LEAF), axis=1))
        return mins, maxs

    timeit_stage("leafb-soa", lambda i: s_leafb_soa(*sorted_v[i]),
                 list(range(nvar)))
    lb_v = [jax.block_until_ready(s_leafb_soa(*sorted_v[i]))
            for i in range(nvar)]

    # e) karras variants on cluster codes
    sc_v = [jax.block_until_ready(jnp.sort(c)[::LEAF]) for c in codes_v]

    @jax.jit
    def s_karras_old(sc):
        return karras_topology(sc)

    @jax.jit
    def s_karras_scan(sc):
        return karras_topology_scan(sc)

    timeit_stage("karras-old", s_karras_old, sc_v)
    timeit_stage("karras-scan", s_karras_scan, sc_v)
    topo_v = [jax.block_until_ready(s_karras_scan(c)) for c in sc_v]

    # f) refit variants — (L,3) row form vs flat table
    @jax.jit
    def s_refit_old(topo, lb):
        _, _, lo, hi = topo
        mins, maxs = lb
        return refit_ranges(lo, hi, jnp.stack(mins, 1), jnp.stack(maxs, 1))

    @jax.jit
    def s_refit_flat(topo, lb):
        _, _, lo, hi = topo
        mins, maxs = lb
        return refit_ranges_flat(lo, hi, jnp.stack(mins, 1),
                                 jnp.stack(maxs, 1))

    timeit_stage("refit-old", lambda i: s_refit_old(topo_v[i], lb_v[i]),
                 list(range(nvar)))
    timeit_stage("refit-flat", lambda i: s_refit_flat(topo_v[i], lb_v[i]),
                 list(range(nvar)))

    # f2) refit flat fully SoA (per-component (L,) tables, 12 gathers)
    @jax.jit
    def s_refit_flat_soa(topo, lb):
        _, _, lo, hi = topo
        mins, maxs = lb
        import math
        levels = max(1, math.ceil(math.log2(max(L, 2)))) + 1
        length = hi - lo + 1
        k = jnp.minimum(31 - jax.lax.clz(jnp.maximum(length, 1)), levels - 1)
        b = jnp.clip(hi - jnp.left_shift(jnp.int32(1), k) + 1, 0, L - 1)
        base = k * L
        outs = []
        for c in range(3):
            cm, cM = mins[c], maxs[c]
            tmins, tmaxs = [cm], [cM]
            for lvl in range(1, levels):
                half = 1 << (lvl - 1)
                if half < L:
                    cm = jnp.minimum(cm, jnp.concatenate(
                        [cm[half:], jnp.broadcast_to(cm[-1:], (half,))]))
                    cM = jnp.maximum(cM, jnp.concatenate(
                        [cM[half:], jnp.broadcast_to(cM[-1:], (half,))]))
                tmins.append(cm)
                tmaxs.append(cM)
            tm = jnp.concatenate(tmins)
            tM = jnp.concatenate(tmaxs)
            outs.append(jnp.minimum(jnp.take(tm, base + lo),
                                    jnp.take(tm, base + b)))
            outs.append(jnp.maximum(jnp.take(tM, base + lo),
                                    jnp.take(tM, base + b)))
        return outs

    timeit_stage("refit-flat-soa",
                 lambda i: s_refit_flat_soa(topo_v[i], lb_v[i]),
                 list(range(nvar)))

    # g) collapse (existing) for completeness
    from rtk_tpu.builder.collapse import collapse_wide

    @jax.jit
    def s_collapse(topo, bb, lb):
        left, right, lo, hi = topo
        mins, maxs = lb
        return collapse_wide(left, right, bb[0], bb[1],
                             jnp.stack(mins, 1), jnp.stack(maxs, 1), 8)

    bb_v = [jax.block_until_ready(s_refit_flat(topo_v[i], lb_v[i]))
            for i in range(nvar)]
    timeit_stage("collapse", lambda i: s_collapse(topo_v[i], bb_v[i],
                                                  lb_v[i]),
                 list(range(nvar)))


if __name__ == "__main__":
    main()
