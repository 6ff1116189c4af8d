"""TPU sweep: binned re-binning engine on the atrium incoherent bounce."""
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
    from rtk_tpu.testing.binned import trace_packets_binned
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

    ref = trace_packets(packed, bounce, dual=True)
    ref_hits = int(np.asarray(ref.hit).sum())
    log(f"ref (packet dual) hits: {ref_hits}")

    for depth, C in [(2, 4), (2, 8), (3, 8), (3, 16), (3, 4)]:
        try:
            dt = timeit(lambda: trace_packets_binned(
                packed, bounce, depth=depth, max_candidates=C),
                iters=2, batches=2)
            out = trace_packets_binned(packed, bounce, depth=depth,
                                       max_candidates=C)
            hits = int(np.asarray(out.hit).sum())
            flag = "" if hits == ref_hits else f"  HITS {hits} != ref!"
            log(f"binned d={depth} C={C:2d}   {dt*1e3:8.1f} ms  "
                f"{nrays/dt/1e6:7.2f} Mrays/s{flag}")
        except Exception as e:
            log(f"binned d={depth} C={C} FAILED: {type(e).__name__}: {e}")

    # primaries through the binned engine (should not regress much)
    try:
        dt = timeit(lambda: trace_packets_binned(packed, cam, depth=2,
                                                 max_candidates=8),
                    iters=2, batches=2)
        log(f"binned primaries d=2 C=8: {dt*1e3:8.1f} ms "
            f"{nrays/dt/1e6:7.2f} Mrays/s")
    except Exception as e:
        log(f"binned primaries FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
