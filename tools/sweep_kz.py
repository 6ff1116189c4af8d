"""TPU: kz-binned leaf tables vs baseline at the 67M headline config."""
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
    cfg = BuildConfig(branching=8, leaf_size=8)
    btris = scenes.blob(subdivisions=6)[0]
    scene = build_from_soup(jnp.asarray(btris), config=cfg)
    packed = pack_scene(scene)
    packed_kz = pack_scene(scene, kz_tables=True)
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton")
    n = rays.count
    log(f"rays: {n}")

    ref = trace_packets(packed, rays, sort_rays=False, dual=True)
    ref_hits = int(np.asarray(ref.hit).sum())
    log(f"ref hits: {ref_hits}")

    variants = [
        ("base dual pkt2048", packed, dict(dual=True)),
        ("kz dual pkt2048", packed_kz, dict(dual=True)),
        ("kz dual pkt2048 sort", packed_kz, dict(dual=True)),
        ("kz nondual pkt2048", packed_kz, dict()),
        ("kz dual pkt4096", packed_kz, dict(dual=True, pkt=4096)),
    ]
    for i, (name, pk, kw) in enumerate(variants):
        try:
            sr = "sort" in name
            dt = timeit(lambda: trace_packets(pk, rays, sort_rays=sr, **kw))
            out = trace_packets(pk, rays, sort_rays=sr, **kw)
            hits = int(np.asarray(out.hit).sum())
            flag = "" if hits == ref_hits else f"  HITS {hits} != ref!"
            log(f"{name:24s} {dt*1e3:8.1f} ms  {n/dt/1e6:7.1f} Mrays/s"
                f"{flag}")
        except Exception as e:
            log(f"{name:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
