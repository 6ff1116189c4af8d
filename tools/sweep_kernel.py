"""Kernel parameter sweep on the bunny-class primary config (real TPU).

For each variant: wall time per trace, Mrays/s, and (via stats=True) the
mean/max while-loop step count per block — separating "too many steps"
(union divergence) from "too slow per step" (scalar overhead).
"""
from __future__ import annotations

import itertools
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
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)
    btris = scenes.blob(subdivisions=6)[0]  # 81,920 tris
    scene = build_from_soup(jnp.asarray(btris), config=cfg)
    packed = pack_scene(scene)
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    n = rays.count

    variants = []
    for p_pk, pkt in [(8, 512), (8, 256), (16, 256), (16, 128), (32, 128),
                      (8, 1024), (4, 512), (16, 512)]:
        variants.append(dict(p_pk=p_pk, pkt=pkt))
    extra = [dict(p_pk=8, pkt=512, dual=True),
             dict(p_pk=8, pkt=512, ordered=True),
             dict(p_pk=16, pkt=256, ordered=True),
             dict(p_pk=8, pkt=512, narrow=False),
             dict(p_pk=8, pkt=512, watertight=False),
             dict(p_pk=8, pkt=512, islab=False),
             dict(p_pk=8, pkt=512, islab=False, ordered=True),
             dict(p_pk=8, pkt=1024, ordered=True),
             dict(p_pk=8, pkt=1024, dual=True)]
    variants += extra

    results = []
    for kw in variants:
        tag = ",".join(f"{k}={v}" for k, v in kw.items())
        try:
            dt = timeit(lambda: trace_packets(packed, rays, sort_rays=False,
                                              **kw))
            # step counts (separate compile; stats build is slower, only
            # need the counts)
            from rtk_tpu.ops import pallas_trace as PT

            o, d = jnp.asarray(rays.origin), jnp.asarray(rays.direction)
            pkt = kw.get("pkt", 512)
            p_pk = kw.get("p_pk", 8)
            comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     jnp.asarray(rays.min_t), jnp.asarray(rays.max_t))
            comps = tuple(c.reshape(n // pkt, pkt) for c in comps)
            roots = jnp.zeros((n // pkt,), jnp.int32)
            qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
            kzs = jnp.zeros((roots.shape[0],), jnp.int32)
            out = PT._run_kernel(
                packed.nodes, packed.tris, comps, roots, qmask, kzs,
                mode="closest",
                watertight=kw.get("watertight", True), interpret=False,
                num_tris=packed.num_tris, leaf_size=packed.leaf_size,
                stats=True, p_pk=p_pk, dual=kw.get("dual", False),
                pkt=pkt, narrow=kw.get("narrow", True),
                ordered=kw.get("ordered", False),
                islab=kw.get("islab", not kw.get("dual", False)))
            steps = np.asarray(out[4])[:, 0]  # (n_rows,), same within block
            blocks = steps.reshape(-1, p_pk)[:, 0]
            results.append((dt, tag, blocks))
            log(f"{tag:48s} {n/dt/1e6:8.2f} Mrays/s  {dt*1e3:7.2f} ms  "
                f"steps/block mean={blocks.mean():.0f} max={blocks.max()} "
                f"sum={blocks.sum()}  ~{dt*1e6/blocks.sum():.2f} us/step")
        except Exception as e:
            log(f"{tag:48s} FAILED: {type(e).__name__}: {e}")
    results.sort(key=lambda r: r[0])
    log("\nbest: " + results[0][1] if results else "none")


if __name__ == "__main__":
    main()
