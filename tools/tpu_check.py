"""TPU smoke: correctness (vs CPU interpret golden) + headline timing."""
from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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

    # correctness at 1024^2 on TPU: hit count + t checksum vs known values
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    for name, kw in [("base", {}), ("dual", dict(dual=True)),
                     ("dual islab", dict(dual=True, islab=True)),
                     ("any", dict(mode="any"))]:
        h = trace_packets(packed, rays, sort_rays=False, **kw)
        hits = int(np.asarray(h.hit).sum())
        tsum = float(np.asarray(jnp.where(h.hit, h.t, 0).sum()))
        log(f"{name:12s} hits={hits} tsum={tsum:.2f}")

    # headline timing
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              8192, 8192, order="morton")
    out = trace_packets(packed, rays, sort_rays=False, dual=True)
    jax.block_until_ready(out.t)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out = trace_packets(packed, rays, sort_rays=False, dual=True)
        jax.block_until_ready(out.t)
        best = min(best, (time.perf_counter() - t0) / 3)
    hits = int(np.asarray(out.hit).sum())
    log(f"headline 67M: {best*1e3:.1f} ms -> {rays.count/best/1e6:.1f} "
        f"Mrays/s  hits={hits}")


if __name__ == "__main__":
    main()
