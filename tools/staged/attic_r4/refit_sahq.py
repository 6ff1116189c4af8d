"""TPU probe: step-quantized SAH topology under the deforming refit-scan
executor (r4 refit_packed_binary) vs the LBVH baseline — the PERF_NOTES
refit-sweep entry named this the candidate to get under 6 ms/frame.

Bench refit config shapes: deforming_grid(n=96) = 18,432 tris, 256^2
rays, F=32 scan + hoisted sort (7.95 ms/frame LBVH on the probe day).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/refit_sahq.py
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig
from rtk_tpu.builder.sah import build_sah_packed
from rtk_tpu.ops.pallas_trace import trace_packets_refit_frames
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes
from rtk_tpu.types import Rays


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    F = 32
    g0 = np.asarray(scenes.deforming_grid(0.0, n=96))
    clip = jnp.stack([jnp.asarray(scenes.deforming_grid(0.05 * i, n=96))
                      for i in range(F)])
    cam = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 256, 256,
                             order="morton")

    def vary(m=4):
        base = jnp.asarray(cam.min_t)
        vs = [Rays(origin=cam.origin, direction=cam.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=cam.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    cands = []
    cfg8 = BuildConfig(branching=8, leaf_size=8)
    scene_l = build_from_soup(jnp.asarray(g0), config=cfg8)
    cands.append(("lbvh-k8 (7.95 ref)", pack_scene(scene_l), scene_l, {}))
    cands.append(("lbvh-k8 loop+defuv", pack_scene(scene_l), scene_l,
                  dict(leaf_loop=True, defer_uv=True)))
    for k in (8, 16):
        pk, aux = build_sah_packed(
            (g0.reshape(-1, 3), np.arange(g0.shape[0] * 3).reshape(-1, 3)),
            BuildConfig(leaf_size=k), step_quant=True, refittable=True)
        cands.append((f"sahq-k{k}", pk, aux, {}))
        if k == 16:
            cands.append((f"sahq-k{k} loop+defuv", pk, aux,
                          dict(leaf_loop=True, defer_uv=True)))

    n_hit_ref = None
    for name, pk, sc, kw in cands:
        try:
            t0 = time.time()
            out = trace_packets_refit_frames(pk, sc, clip, cam,
                                             sort_rays=True, **kw)
            nh = int(np.asarray(out[0].hit).sum())
            np.asarray(out[-1].t[:1])
            log(f"{name}: compile+first {time.time()-t0:.1f}s  "
                f"n_hit(f0)={nh}")
            if n_hit_ref is None:
                n_hit_ref = nh
            elif nh != n_hit_ref:
                log(f"{name}: HIT-COUNT MISMATCH vs {n_hit_ref}")
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    o = trace_packets_refit_frames(pk, sc, clip, nxt(),
                                                   sort_rays=True, **kw)
                np.asarray(o[-1].t[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            log(f"{name}: {best/F*1e3:.2f} ms/frame "
                f"({cam.count*F/best/1e6:.1f} Mrays/s eq)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
