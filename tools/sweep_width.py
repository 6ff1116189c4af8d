"""TPU sweep: packet width / P / leaf_size at the 67M-ray headline,
plus step-count stats.  (Clean re-run of the rows the lesion sweep lost
to a wedged device after OOM compiles.)"""
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

    from rtk_tpu import BuildConfig
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    btris = scenes.blob(subdivisions=6)[0]
    packs = {}
    for k in (8, 16):
        sc = build_from_soup(jnp.asarray(btris),
                             config=BuildConfig(branching=8, leaf_size=k))
        packs[k] = pack_scene(sc)
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton")
    n = rays.count
    log(f"rays: {n}")

    # reference hit count for sanity (junk runs show up as wrong hits)
    ref = trace_packets(packs[8], rays, sort_rays=False, dual=True)
    ref_hits = int(np.asarray(ref.hit).sum())
    log(f"ref hits: {ref_hits}")

    variants = [
        ("K8 pkt2048 P8 dual", 8, dict(dual=True, pkt=2048)),
        ("K8 pkt4096 P8 dual", 8, dict(dual=True, pkt=4096)),
        ("K8 pkt8192 P8 dual", 8, dict(dual=True, pkt=8192)),
        ("K8 pkt2048 P16 dual", 8, dict(dual=True, pkt=2048, p_pk=16)),
        ("K8 pkt4096 P16 dual", 8, dict(dual=True, pkt=4096, p_pk=16)),
        ("K16 pkt2048 P8 dual", 16, dict(dual=True, pkt=2048)),
        ("K16 pkt4096 P8 dual", 16, dict(dual=True, pkt=4096)),
    ]
    for name, k, kw in variants:
        try:
            dt = timeit(lambda: trace_packets(packs[k], rays,
                                              sort_rays=False, **kw))
            out = trace_packets(packs[k], rays, sort_rays=False, **kw)
            hits = int(np.asarray(out.hit).sum())
            flag = "" if hits == ref_hits else f"  HITS {hits} != ref!"
            log(f"{name:24s} {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s"
                f"{flag}")
        except Exception as e:
            log(f"{name:24s} FAILED: {type(e).__name__}: {e}")

    # step counts for the base config
    for name, k, kw in [("K8 pkt2048 dual", 8, dict(dual=True, pkt=2048)),
                        ("K16 pkt2048 dual", 16, dict(dual=True, pkt=2048)),
                        ("K8 pkt4096 dual", 8, dict(dual=True, pkt=4096))]:
        try:
            _, steps = trace_packets(packs[k], rays, sort_rays=False,
                                     stats=True, **kw)
            st = np.asarray(steps)
            log(f"steps {name:20s} mean/block={st.mean():7.1f} "
                f"max={st.max()}")
        except Exception as e:
            log(f"steps {name:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
