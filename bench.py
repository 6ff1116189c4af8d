"""Headline benchmark: primary-ray closest-hit throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured Mrays/s divided by the BASELINE.json north-star
target (500 Mrays/s/chip primary rays on v5p).

Config: bunny-class scene (81,920-tri displaced icosphere standing in for
the 69k Stanford bunny — no assets in this environment) at 512x512 primary
rays, matching BASELINE config 2.  Extra diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_MRAYS = 500.0


def main():
    import jax

    from rtk_tpu import BuildConfig, build_scene
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    import jax.numpy as jnp

    from rtk_tpu.scene import build_from_soup

    tris = scenes.blob(subdivisions=6)[0]  # 81,920 tris
    t_count = tris.shape[0]

    # --- build throughput (on-device pipeline; soup already uploaded,
    # matching the BASELINE "LBVH build" metric) ---
    cfg = BuildConfig(branching=8, leaf_size=8)
    tris_dev = jax.block_until_ready(jnp.asarray(tris))
    t0 = time.perf_counter()
    scene = build_from_soup(tris_dev, config=cfg)
    jax.block_until_ready(scene.node_min)
    t_compile = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        scene = build_from_soup(tris_dev, config=cfg)
    jax.block_until_ready(scene.node_min)
    t_build = (time.perf_counter() - t0) / iters
    print(f"build: {t_count} tris in {t_build*1e3:.1f} ms "
          f"({t_count/t_build/1e6:.1f} Mtris/s; first call {t_compile:.1f}s)",
          file=sys.stderr)
    packed = pack_scene(scene)

    # --- primary-ray throughput (Pallas packet kernel) ---
    rays = scenes.camera_rays((0, 0, 3.0), (0.0, 0.0, 0.0), (0, 1, 0),
                              45.0, 512, 512)

    def run():
        return trace_packets(packed, rays)

    t0 = time.perf_counter()
    hits = run()
    jax.block_until_ready(hits.t)
    print(f"trace compile+run: {time.perf_counter()-t0:.1f}s, "
          f"hit rate {float(np.asarray(hits.hit).mean()):.3f}",
          file=sys.stderr)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        hits = run()
    jax.block_until_ready(hits.t)
    dt = (time.perf_counter() - t0) / iters
    mrays = rays.count / dt / 1e6
    print(f"trace: {rays.count} rays in {dt*1e3:.1f} ms -> {mrays:.1f} Mrays/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": "primary_ray_closest_hit_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
