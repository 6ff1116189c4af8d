"""TPU probe: jax.profiler trace of ONE instanced 1M-ray closest call
(bench config-5 shapes, C=12 cond-rounds) — splits the ~1.3 s/trace
between the grouping sorts, the packet kernel rounds, the candidate
pass and the residual, so the next attack targets the dominant cost
(PERF_NOTES r4 instanced entry names the live rounds' sorts as the
suspect).

Writes the trace to /tmp/inst_prof (inspect op names/durations with
tensorboard offline or the trace.json.gz directly).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/inst_prof.py
"""
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import BuildConfig, Rays
from rtk_tpu.builder.sah import build_sah_forest
from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                trace_closest_instanced_packets)
from rtk_tpu.scene import build_from_soup
from rtk_tpu.testing import scenes


def log(m):
    print(m, file=sys.stderr, flush=True)


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
    kw = dict(max_candidates=12, leaf_loop=True)
    t0 = time.time()
    h, _ = trace_closest_instanced_packets(ps, cam, **kw)
    log(f"warm {time.time()-t0:.0f}s n_hit={int(np.asarray(h.hit).sum())}")
    rays2 = Rays(origin=cam.origin, direction=cam.direction,
                 min_t=cam.min_t + 1e-7, max_t=cam.max_t)
    with jax.profiler.trace("/tmp/inst_prof"):
        h2, _ = trace_closest_instanced_packets(ps, rays2, **kw)
        np.asarray(h2.t[:1])
    # Summarise the device trace: aggregate op durations by name prefix.
    files = glob.glob("/tmp/inst_prof/**/*.trace.json.gz", recursive=True)
    log(f"trace files: {files}")
    for f in files[:1]:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        tot = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")[:60]
                tot[name] = tot.get(name, 0) + ev["dur"]
        for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            log(f"{dur/1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
