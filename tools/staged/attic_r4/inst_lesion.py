"""TPU probe: instanced cost split via lesioning (round-5 planning).

The tunnel profiler exposes no device lanes (PERF_NOTES r4), so split
the ~1.3 s/trace by substitution instead:
  A) real trace, exact=True  (the bench number)
  B) real trace, exact=False (A - B = residual share)
  C) KERNEL STUBBED (trace_packets monkeypatched to all-miss),
     exact=False            (B - C = packet-kernel share;
                             C = candidates + sorts + transforms +
                             unsort/merge + dispatch overhead)
WRONG RESULTS by design in C — timing attribution only.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/inst_lesion.py
"""
import sys
import time
import types

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig, Rays
from rtk_tpu.builder.sah import build_sah_forest
import rtk_tpu.ops.pallas_trace as pt
from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                trace_closest_instanced_packets)
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


REAL_TRACE = pt.trace_packets


def stub_trace(packed, rays, **kw):
    n = rays.count
    return types.SimpleNamespace(
        t=jnp.asarray(rays.max_t),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        slot=jnp.full((n,), -1, jnp.int32),
        hit=jnp.zeros((n,), bool))


def main():
    cfg = BuildConfig(branching=8, leaf_size=8)
    blas_tris = scenes.blob(subdivisions=6)[0]
    blas = build_from_soup(jnp.asarray(blas_tris), config=cfg)
    sah_pack = build_sah_forest([blas_tris], cfg)
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
    ps = pack_instanced(iscene, packed=sah_pack[0],
                        packed_roots=sah_pack[1])
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

    # Case C passes ordered=True ONLY to bust _instanced_packets_jit's
    # lru_cache (same static key would reuse case B's program, traced
    # with the REAL kernel); the kernel is stubbed so the flag itself
    # changes nothing about what C times.
    for name, exact, stub, extra in (
            ("A real exact", True, False, {}),
            ("B real noexact", False, False, {}),
            ("C stubbed-kernel noexact", False, True,
             dict(ordered=True))):
        pt.trace_packets = stub_trace if stub else REAL_TRACE
        try:
            t0 = time.time()
            h, _ = trace_closest_instanced_packets(
                ps, cam, max_candidates=12, leaf_loop=True, exact=exact,
                **extra)
            nh = int(np.asarray(h.hit).sum())
            log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    o, _ = trace_closest_instanced_packets(
                        ps, nxt(), max_candidates=12, leaf_loop=True,
                        exact=exact, **extra)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            log(f"{name}: {best*1e3:.0f} ms/trace "
                f"({N/best/1e6:.2f} Mrays/s)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
        finally:
            pt.trace_packets = REAL_TRACE


if __name__ == "__main__":
    main()
