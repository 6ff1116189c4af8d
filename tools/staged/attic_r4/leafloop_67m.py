"""TPU probe: leaf_loop (+ kz_static) at the 67M headline (VERDICT r4 item 1).

The lesion data says the leaf phase is 51% of the sahq-k16-ordered frame
and its bulk is the shear transform + edge functions; kz_static removes
the 18 axis-select ops per triangle but spilled at K=16 when unrolled
(PERF_NOTES r3).  leaf_loop bounds the scheduler scope to 8-triangle
chunks.  Candidates (all defer_uv, dual, bench camera):

  base      sahq-k16-ordered              (r3 record: 253.8 Mrays/s)
  loop      + leaf_loop
  loop+kzs  + leaf_loop + kz_static=2     (the money config)
  kzs       + kz_static=2 (unrolled)      (expected: compile OOM / slow)

Hardened timing: unique input bytes per call, real readback sync.
Parity: hit count + t bit-equality vs base.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/leafloop_67m.py [side]
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu.ops.pallas_trace import trace_packets, uniform_kz
from rtk_tpu.trace.packed import pack_binary_tree
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = 16
    btris = scenes.blob(subdivisions=6)[0]
    orc = NativeOracle(btris.reshape(-1, 9), leaf_max=k, step_quant=True)
    packed = pack_binary_tree(btris, *orc.export_tree(), leaf_size=k)
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              side, side, order="morton")
    log(f"rays: {rays.count}  uniform_kz: {uniform_kz(rays)}")

    def variants(rays, m=6):
        base = jnp.asarray(rays.min_t)
        from rtk_tpu.types import Rays
        vs = [Rays(origin=rays.origin, direction=rays.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=rays.max_t) for i in range(m)]
        i = [0]
        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    ref = None
    cands = [
        ("base", dict(ordered=True, defer_uv=True, dual=True)),
        ("loop", dict(ordered=True, defer_uv=True, dual=True,
                      leaf_loop=True)),
        ("loop+kzs", dict(ordered=True, defer_uv=True, dual=True,
                          leaf_loop=True, kz_static=2)),
    ]
    for name, kw in cands:
        try:
            t0 = time.time()
            out = trace_packets(packed, rays, sort_rays=False, **kw)
            nh = int(np.asarray(out.hit).sum())
            t_s = np.asarray(out.t)
            log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
            if ref is None:
                ref = (nh, t_s)
            else:
                ok = nh == ref[0] and bool((t_s == ref[1]).all())
                log(f"{name}: parity {'OK' if ok else 'MISMATCH'}")
            del out, t_s
            nxt = variants(rays)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(3):
                    o = trace_packets(packed, nxt(), sort_rays=False, **kw)
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 3)
            log(f"{name}: {best*1e3:.1f} ms -> "
                f"{rays.count/best/1e6:.1f} Mrays/s")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
