"""TPU probe: instanced round packet-unit sweep under the r5 flags.

The unit=128 verdict predates ordered/prune/leaf_loop/caps (r1:
"512-ray unit 20-30% slower").  bounce4 later showed narrow-wide
blocks flip once pruning lands; re-probe unit 128/256 x closest and the
pooled-caps wavefront.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/inst8.py
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig, Rays
from rtk_tpu.builder.sah import build_sah_forest
from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                trace_closest_instanced_packets,
                                calibrate_round_caps)
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    cfg = BuildConfig(branching=8, leaf_size=8)
    blas_tris = scenes.blob(subdivisions=6)[0]
    blas = build_from_soup(jnp.asarray(blas_tris), config=cfg)
    sp16 = build_sah_forest([blas_tris],
                            BuildConfig(branching=8, leaf_size=16))
    n_inst, side = 125, 5
    tf = np.zeros((n_inst, 3, 4), np.float32)
    rng5 = np.random.default_rng(7)
    for i in range(n_inst):
        gx, gy, gz = i % side, (i // side) % side, i // (side * side)
        sc = 0.35 + 0.15 * rng5.random()
        tf[i, :, :3] = np.eye(3, dtype=np.float32) * sc
        tf[i, :, 3] = (np.array([gx, gy, gz], np.float32) * 1.1
                       + rng5.random(3).astype(np.float32) * 0.2)
    iscene = build_instanced([blas], np.zeros(n_inst, np.int64), tf)
    ps = pack_instanced(iscene, packed=sp16[0], packed_roots=sp16[1])
    cam = scenes.camera_rays((7, 6.5, 8), (2.2, 2.2, 2.2), (0, 1, 0), 55,
                             1024, 1024, order="morton")
    N = cam.count

    def vary(m=5):
        base = jnp.asarray(cam.min_t)
        vs = [Rays(origin=cam.origin, direction=cam.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=cam.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    n_hit_ref = None
    for unit in (128, 256):
        kw = dict(p_pk=16, ordered=True, leaf_loop=True, unit=unit)
        try:
            t0 = time.time()
            caps = calibrate_round_caps(ps, cam, max_candidates=12, **kw)
            log(f"unit={unit}: calibration {time.time()-t0:.1f}s "
                f"caps={caps}")
            t0 = time.time()
            h, _ = trace_closest_instanced_packets(
                ps, cam, max_candidates=12, round_caps=caps, **kw)
            nh = int(np.asarray(h.hit).sum())
            log(f"unit={unit}: compile+first {time.time()-t0:.1f}s "
                f"n_hit={nh}")
            if n_hit_ref is None:
                n_hit_ref = nh
            elif nh != n_hit_ref:
                log(f"unit={unit}: HIT-COUNT MISMATCH vs {n_hit_ref}")
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    o, _ = trace_closest_instanced_packets(
                        ps, nxt(), max_candidates=12, round_caps=caps,
                        **kw)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            log(f"unit={unit}: {best*1e3:.0f} ms/trace "
                f"({N/best/1e6:.2f} Mrays/s)")
        except Exception as e:
            import traceback
            log(f"unit={unit}: FAILED {type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
