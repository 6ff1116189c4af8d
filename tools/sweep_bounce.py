"""TPU sweep: incoherent bounce batch — packet variants vs stackless.

VERDICT r1 item 3: the atrium incoherent bounce ran at 0.91 Mrays/s on the
packet engine and trace/stackless.py was never raced on TPU.
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
    import numpy as np

    from rtk_tpu import BuildConfig, Rays
    from rtk_tpu.models.path import cosine_sample, geometric_normal
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)
    atr = scenes.atrium()
    scene = build_from_soup(jnp.asarray(atr), config=cfg)
    packed = pack_scene(scene)
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                             side, side, order="morton")
    prim = trace_packets(packed, cam)
    key = jax.random.PRNGKey(0)
    n = geometric_normal(prim, cam.direction)
    bounce_dir = cosine_sample(key, n)
    origin = prim.position() + 1e-3 * n
    bounce = Rays(
        origin=origin, direction=bounce_dir,
        min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
        max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    nrays = cam.count
    log(f"bounce rays: {nrays}")

    variants = [
        ("packet dual (bench cfg)", dict(dual=True)),
        ("packet dual pkt=128", dict(dual=True, pkt=128)),
        ("packet dual pkt=256", dict(dual=True, pkt=256)),
        ("packet non-dual pkt=128", dict(dual=False, pkt=128)),
        ("packet dual pkt=128 P=16", dict(dual=True, pkt=128, p_pk=16)),
        ("packet dual pkt=128 P=32", dict(dual=True, pkt=128, p_pk=32)),
    ]
    for name, kw in variants:
        try:
            dt = timeit(lambda: trace_packets(packed, bounce, **kw))
            log(f"{name:28s} {dt*1e3:8.1f} ms  {nrays/dt/1e6:7.2f} Mrays/s")
        except Exception as e:
            log(f"{name:28s} FAILED: {type(e).__name__}: {e}")

    # Alternative coherence key: origin-Morton + direction octant
    # (models/path.py key) instead of the probe-point key.
    try:
        import numpy as _np

        from rtk_tpu.models.path import _ray_sort_key

        lo = jnp.asarray(atr.reshape(-1, 3).min(axis=0))
        hi = jnp.asarray(atr.reshape(-1, 3).max(axis=0))
        k32 = _ray_sort_key(bounce, lo, hi)
        order = jnp.argsort(k32)
        b2 = Rays(origin=jnp.take(bounce.origin, order, axis=0),
                  direction=jnp.take(bounce.direction, order, axis=0),
                  min_t=jnp.take(bounce.min_t, order),
                  max_t=jnp.take(bounce.max_t, order))
        for name, kw in [("octant-key dual pkt=128",
                          dict(dual=True, pkt=128)),
                         ("octant-key dual pkt=512",
                          dict(dual=True, pkt=512))]:
            dt = timeit(lambda: trace_packets(packed, b2, sort_rays=False,
                                              **kw))
            log(f"{name:28s} {dt*1e3:8.1f} ms  {nrays/dt/1e6:7.2f} Mrays/s")
    except Exception as e:
        log(f"octant-key FAILED: {type(e).__name__}: {e}")

    # Stackless skip-link engine (per-ray, no union waste).
    try:
        from rtk_tpu.trace.stackless import build_stackless, trace_stackless

        sl = build_stackless(scene)
        jax.block_until_ready(sl.entities)
        dt = timeit(lambda: trace_stackless(sl, bounce), iters=2, batches=2)
        log(f"{'stackless':28s} {dt*1e3:8.1f} ms  {nrays/dt/1e6:7.2f} Mrays/s")
        dt = timeit(lambda: trace_stackless(sl, cam), iters=2, batches=2)
        log(f"{'stackless (primary)':28s} {dt*1e3:8.1f} ms  "
            f"{nrays/dt/1e6:7.2f} Mrays/s")
    except Exception as e:
        log(f"stackless FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
