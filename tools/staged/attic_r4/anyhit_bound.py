"""CPU analysis: per-ray traversal-step bound for the any-hit repacking
idea (VERDICT r3 item 8).

The packet kernel's any-mode cost is pinned by each packet's slowest
unresolved lane (PERF_NOTES "Any-hit early exit — TPU confirm": mean
steps only drop 24.0 -> 22.6).  Before building a capped-round /
packet-refill machine, bound what perfect repacking could buy: walk the
oracle's BVH2 per ray on the host, counting ordered near-to-far node
visits for (a) closest and (b) any with first-hit exit, split by
hit/miss outcome.  If the step mass is mostly MISS rays (which must
drain their full traversal to prove the miss in ANY scheme), no
repacking reaches the 1.5x target and the honest outcome is a ledger
entry.

Run (CPU): PYTHONPATH=/root/repo python -u tools/staged/anyhit_bound.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_shadow_rays(side=2048, sample=32768, seed=3):
    """Reproduce the bench config_bunny shadow batch (bench.py:378-406)."""
    btris = scenes.blob(subdivisions=6)[0]
    orc = NativeOracle(btris.reshape(-1, 9))
    cam = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                             side, side, order="morton")
    o = np.asarray(cam.origin)
    d = np.asarray(cam.direction)
    t, _, _, idx = orc.trace(o, d, np.asarray(cam.min_t),
                             np.asarray(cam.max_t))
    hit = idx >= 0
    p = o + t[:, None] * d
    light = np.array([3.0, 4.0, 2.0], np.float32)
    dd = light[None] - p
    dist = np.linalg.norm(dd, axis=1)
    sdir = dd / np.maximum(dist[:, None], 1e-9)
    smax = np.where(hit, dist, 0.0)
    live = smax > 1e-3
    rng = np.random.default_rng(seed)
    pick = rng.choice(np.flatnonzero(live), size=sample, replace=False)
    pick.sort()  # keep pixel (packet) order
    return (btris, p[pick].astype(np.float32), sdir[pick].astype(np.float32),
            np.full(sample, 1e-3, np.float32), smax[pick].astype(np.float32),
            live.sum())


def walk(tree, tris, o, d, mn, mx, mode):
    """Ordered BVH2 traversal; returns (visits, hit)."""
    left, right, first, count, blo, bhi, order, root = tree
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    visits = 0
    best = mx
    found = False
    stack = [root]
    while stack:
        ni = stack.pop()
        visits += 1
        c = count[ni]
        if c > 0:
            f = first[ni]
            ti = order[f:f + c]
            v0 = tris[ti, 0:3]
            e1 = tris[ti, 3:6] - v0
            e2 = tris[ti, 6:9] - v0
            pv = np.cross(np.broadcast_to(d, e2.shape), e2)
            det = np.einsum("ij,ij->i", e1, pv)
            sv = o - v0
            u = np.einsum("ij,ij->i", sv, pv)
            qv = np.cross(sv, e1)
            v = np.einsum("ij,ij->i", np.broadcast_to(d, qv.shape), qv)
            t = np.einsum("ij,ij->i", e2, qv)
            with np.errstate(divide="ignore", invalid="ignore"):
                invd = 1.0 / det
                uu, vv, tt = u * invd, v * invd, t * invd
            ok = ((det != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
                  & (tt > mn) & (tt < best))
            if ok.any():
                best = tt[ok].min()
                found = True
                if mode == "any":
                    return visits, True
            continue
        # internal: slab both children, push far-then-near of the hits
        ch = [left[ni], right[ni]]
        ent = []
        for cc in ch:
            t0 = (blo[cc] - o) * inv
            t1 = (bhi[cc] - o) * inv
            tn = np.minimum(t0, t1).max()
            tf = np.maximum(t0, t1).min()
            e = tn if (tf >= max(tn, mn) and tn < best) else None
            ent.append(e)
        pairs = [(e, cc) for e, cc in zip(ent, ch) if e is not None]
        pairs.sort(key=lambda x: -x[0])  # far first -> near popped first
        stack.extend(cc for _, cc in pairs)
    return visits, found


def main():
    t0 = time.time()
    btris, o, d, mn, mx, nlive = build_shadow_rays()
    tris = btris.reshape(-1, 9)
    orc = NativeOracle(tris, leaf_max=8)
    tree = orc.export_tree()
    log(f"setup {time.time()-t0:.0f}s; {len(o)} sampled of {nlive} live")

    n = len(o)
    vc = np.zeros(n, np.int64)
    va = np.zeros(n, np.int64)
    hitm = np.zeros(n, bool)
    t0 = time.time()
    for i in range(n):
        vc[i], h = walk(tree, tris, o[i], d[i], mn[i], mx[i], "closest")
        va[i], _ = walk(tree, tris, o[i], d[i], mn[i], mx[i], "any")
        hitm[i] = h
    log(f"walk {time.time()-t0:.0f}s")

    hf = hitm.mean()
    log(f"hit fraction (occluded): {hf:.3f}")
    log(f"closest visits: total {vc.sum()}  mean {vc.mean():.1f}  "
        f"hit-rays {vc[hitm].mean():.1f}  miss-rays {vc[~hitm].mean():.1f}")
    log(f"any visits:     total {va.sum()}  mean {va.mean():.1f}  "
        f"hit-rays {va[hitm].mean():.1f}  miss-rays {va[~hitm].mean():.1f}")
    log(f"ideal-repack any/closest work ratio: {va.sum()/vc.sum():.3f}")
    miss_mass = va[~hitm].sum() / va.sum()
    log(f"share of ANY step mass on irreducible miss rays: {miss_mass:.3f}")
    # Packet-pinning estimate: consecutive 2048-ray groups in pixel order
    # (proxy for the kernel's packets) — max/mean within group is the
    # factor the CURRENT kernel pays over ideal repacking.
    g = 2048
    m = (n // g) * g
    grp = va[:m].reshape(-1, g)
    log(f"per-2048-group any: mean-of-max {grp.max(axis=1).mean():.1f} "
        f"vs mean {grp.mean():.1f} "
        f"(pin factor {grp.max(axis=1).mean()/grp.mean():.2f})")


if __name__ == "__main__":
    main()
