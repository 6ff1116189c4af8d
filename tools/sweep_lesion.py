"""TPU sweep: attribute headline-config time to kernel components.

Lesion variants produce WRONG RESULTS by design — they exist to measure
where the milliseconds go at the 67M-ray headline config (pkt=2048,
islab auto, dual=True).
"""
from __future__ import annotations

import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters=3, batches=2):
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
    btris = scenes.blob(subdivisions=6)[0]
    scene = build_from_soup(jnp.asarray(btris), config=cfg)
    packed = pack_scene(scene)
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton")
    n = rays.count
    log(f"rays: {n}")

    variants = [
        ("base dual", dict(dual=True)),
        ("dual=False", dict(dual=False)),
        ("dual=False ordered(prune)", dict(dual=False, ordered=True)),
        ("noleaf", dict(dual=True, lesion="noleaf")),
        ("noselk", dict(dual=True, lesion="noselk")),
        ("noupdv", dict(dual=True, lesion="noupdv")),
        ("nodiv", dict(dual=True, lesion="nodiv")),
        ("noselk+noupdv+nodiv", dict(dual=True,
                                     lesion="noselk noupdv nodiv")),
        ("islab=False", dict(dual=True, islab=False)),
        ("P=16", dict(dual=True, p_pk=16)),
        ("P=4", dict(dual=True, p_pk=4)),
        ("pkt=4096", dict(dual=True, pkt=4096)),
        ("pkt=1024", dict(dual=True, pkt=1024)),
    ]
    for name, kw in variants:
        try:
            dt = timeit(lambda: trace_packets(packed, rays,
                                              sort_rays=False, **kw))
            log(f"{name:28s} {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s")
        except Exception as e:
            log(f"{name:28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
