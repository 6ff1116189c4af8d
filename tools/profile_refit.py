"""TPU breakdown of the deforming refit+trace frame (VERDICT r1 item 5).

The fused frame measured 13.1 ms at 18k tris; this times each component as
its own (jitted) program to see where the milliseconds go:
refit / repack / trace / fused, plus the fixed dispatch cost.
"""
from __future__ import annotations

import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters=10, batches=3):
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

    from rtk_tpu import BuildConfig, refit
    from rtk_tpu.ops.pallas_trace import trace_packets, trace_packets_refit
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene, repack_bounds
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)
    grid0 = scenes.deforming_grid(0.0, n=96)  # 18,432 tris
    scene = build_from_soup(jnp.asarray(grid0), config=cfg)
    packed = pack_scene(scene)
    frames = [jnp.asarray(scenes.deforming_grid(t, n=96))
              for t in (0.1, 0.2, 0.3)]
    cam = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 256, 256,
                             order="morton")

    refit_j = jax.jit(refit)
    repack_j = jax.jit(repack_bounds)

    dt = timeit(lambda: refit_j(scene, frames[1]))
    log(f"refit alone:        {dt*1e3:7.2f} ms")
    scene2 = refit_j(scene, frames[1])
    dt = timeit(lambda: repack_j(packed, scene2))
    log(f"repack alone:       {dt*1e3:7.2f} ms")
    packed2 = repack_j(packed, scene2)
    dt = timeit(lambda: trace_packets(packed2, cam, sort_rays=False))
    log(f"trace alone:        {dt*1e3:7.2f} ms")
    dt = timeit(lambda: trace_packets_refit(packed, scene, frames[1], cam,
                                            sort_rays=False))
    log(f"fused frame:        {dt*1e3:7.2f} ms")

    # dispatch floor: a trivial jitted op after a Pallas launch
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    dt = timeit(lambda: f(x), iters=20)
    log(f"tiny-op dispatch:   {dt*1e3:7.2f} ms")
    # trace at larger ray count to separate fixed vs per-ray costs
    cam2 = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 1024,
                              1024, order="morton")
    dt = timeit(lambda: trace_packets(packed2, cam2, sort_rays=False),
                iters=5)
    log(f"trace 1M rays:      {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
