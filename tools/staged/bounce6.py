"""TPU probe: kz-binned bounce dispatch vs the r4 flat record (1.77).

trace_packets_kz_binned splits the bounce batch into three axis-pure
sub-batches (one fused sort + one fused 3-kernel program) so each runs
kz_static select-free leaf math — worth +12% at the headline
(leaf_loop+kzs2) and unavailable to mixed batches until now.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python -u tools/staged/bounce6.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rtk_tpu import Rays
from rtk_tpu.models.path import cosine_sample, geometric_normal
from rtk_tpu.ops.pallas_trace import trace_packets, trace_packets_kz_binned
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.trace.packed import pack_binary_tree


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    atr = scenes.atrium()
    orc = NativeOracle(atr.reshape(-1, 9), leaf_max=16, step_quant=True)
    packed = pack_binary_tree(atr, *orc.export_tree(), leaf_size=16)
    del orc
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60,
                             1024, 1024, order="morton")
    prim = trace_packets(packed, cam)
    key = jax.random.PRNGKey(0)
    nrm = geometric_normal(prim, cam.direction)
    bounce_dir = cosine_sample(key, nrm)
    origin = prim.position() + 1e-3 * nrm
    bounce = Rays(
        origin=origin, direction=bounce_dir,
        min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
        max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    N = cam.count

    def vary(m=5):
        base = jnp.asarray(bounce.min_t)
        vs = [Rays(origin=bounce.origin, direction=bounce.direction,
                   min_t=base + jnp.float32(1e-7) * (i + 1),
                   max_t=bounce.max_t) for i in range(m)]
        i = [0]

        def nxt():
            i[0] += 1
            return vs[i[0] % m]
        return nxt

    kwf = dict(dual=True, leaf_loop=True, ordered=True, defer_uv=True)
    n_hit_ref = None
    for name, fn in (
            ("flat p16 pkt256 (1.77 ref)",
             lambda r: trace_packets(packed, r, pkt=256, p_pk=16, **kwf)),
            ("kz-binned p16 pkt256",
             lambda r: trace_packets_kz_binned(packed, r, pkt=256,
                                               p_pk=16, **kwf)),
            ("kz-binned p16 pkt128",
             lambda r: trace_packets_kz_binned(packed, r, pkt=128,
                                               p_pk=16, **kwf)),
    ):
        try:
            t0 = time.time()
            h = fn(bounce)
            nh = int(np.asarray(h.hit).sum())
            log(f"{name}: compile+first {time.time()-t0:.1f}s  n_hit={nh}")
            if n_hit_ref is None:
                n_hit_ref = nh
            elif nh != n_hit_ref:
                log(f"{name}: HIT-COUNT MISMATCH vs {n_hit_ref}")
            nxt = vary()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(2):
                    o = fn(nxt())
                np.asarray(o.t[:1])
                best = min(best, (time.perf_counter() - t0) / 2)
            log(f"{name}: {best*1e3:.0f} ms ({N/best/1e6:.2f} Mrays/s)")
        except Exception as e:
            import traceback
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
