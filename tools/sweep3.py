"""TPU sweep: leaf_size x stepping mode (steps are expensive, vector cheap)."""
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
    btris = scenes.blob(subdivisions=6)[0]
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    n = rays.count
    ref = None

    for k in (8, 16, 32):
        cfg = BuildConfig(branching=8, leaf_size=k)
        scene = build_from_soup(jnp.asarray(btris), config=cfg)
        packed = pack_scene(scene)
        for kw in [dict(islab=False), dict(dual=True),
                   dict(islab=False, ordered=True),
                   dict(islab=False, pkt=1024),
                   dict(dual=True, pkt=1024)]:
            tag = f"K={k:2d} " + (",".join(
                f"{kk}={v}" for kk, v in kw.items()) or "default")
            try:
                dt = timeit(lambda: PT.trace_packets(
                    packed, rays, sort_rays=False, **kw))
                got = PT.trace_packets(packed, rays, sort_rays=False, **kw)
                t_arr = np.asarray(got.t)
                if ref is None:
                    ref, err = t_arr, 0.0
                else:
                    err = float(np.abs(t_arr - ref).max())
                log(f"{tag:44s} {n/dt/1e6:8.2f} Mrays/s {dt*1e3:7.2f} ms "
                    f"max|dt|={err:.2e}")
            except Exception as e:
                log(f"{tag:44s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
