"""Focused TPU sweep: pruning / dual / packet-width interactions."""
from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters=5, batches=3):
    import jax

    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from rtk_tpu import BuildConfig
    from rtk_tpu.ops import pallas_trace as PT
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)
    btris = scenes.blob(subdivisions=6)[0]
    scene = build_from_soup(jnp.asarray(btris), config=cfg)
    packed = pack_scene(scene)
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    n = rays.count

    ref = None
    variants = [
        dict(islab=False),
        dict(islab=False, ordered=True),          # prune, per-ray dists
        dict(ordered=True),                        # prune, islab dists
        dict(islab=False, ordered=True, pkt=1024),
        dict(ordered=True, pkt=1024),
        dict(dual=True),
        dict(dual=True, pkt=1024),
        dict(islab=False, ordered=True, pkt=768),
        dict(),
    ]
    for kw in variants:
        tag = ",".join(f"{k}={v}" for k, v in kw.items()) or "default"
        try:
            dt = timeit(lambda: PT.trace_packets(packed, rays,
                                                 sort_rays=False, **kw))
            got = PT.trace_packets(packed, rays, sort_rays=False, **kw)
            t_arr = np.asarray(got.t)
            if ref is None:
                ref = t_arr
                err = 0.0
            else:
                err = float(np.abs(t_arr - ref).max())
            pkt = kw.get("pkt", 512)
            p_pk = kw.get("p_pk", 8)
            o, d = jnp.asarray(rays.origin), jnp.asarray(rays.direction)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     jnp.asarray(rays.min_t), jnp.asarray(rays.max_t))
            comps = tuple(c.reshape(n // pkt, pkt) for c in comps)
            roots = jnp.zeros((n // pkt,), jnp.int32)
            qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
            kzs = jnp.zeros((roots.shape[0],), jnp.int32)
            out = PT._run_kernel(
                packed.nodes, packed.tris, comps, roots, qmask, kzs,
                mode="closest",
                watertight=True, interpret=False,
                num_tris=packed.num_tris, leaf_size=packed.leaf_size,
                stats=True, p_pk=p_pk, dual=kw.get("dual", False),
                pkt=pkt, narrow=True, ordered=kw.get("ordered", False),
                islab=kw.get("islab", not kw.get("dual", False)))
            steps = np.asarray(out[4])[:, 0]
            blocks = steps.reshape(-1, p_pk)[:, 0]
            log(f"{tag:44s} {n/dt/1e6:8.2f} Mrays/s {dt*1e3:7.2f} ms "
                f"steps sum={blocks.sum()} ~{dt*1e6/blocks.sum():.2f} us/step"
                f"  max|dt|={err:.2e}")
        except Exception as e:
            log(f"{tag:44s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
