"""Headline probe: defer_uv on sahq-k16-ordered at 67M rays.

The sah300d lesion attribution (PERF_NOTES r3) priced the leaf phase's
u/v carry updates at ~10 ms and the rcp_det normalises feed them; the
defer_uv feature drops both from the kernel (u/v recompute lazily in
PacketHits on access — the bench headline never reads them) and trims
the hit-record unscatter from 5 sort operands to 3.

Run (ONE TPU process at a time):
    python tools/staged/deferuv_67m.py [side]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
import bench  # hardened timeit + vary_rays + compile cache
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.testing import scenes
from rtk_tpu.testing.native_oracle import NativeOracle
from rtk_tpu.trace.packed import pack_binary_tree

T0 = time.perf_counter()


def log(s):
    print(f"[{time.perf_counter()-T0:6.0f}s] {s}", flush=True)


bench._enable_compile_cache()
side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
btris = scenes.blob(subdivisions=6)[0]
orc = NativeOracle(btris.reshape(-1, 9), leaf_max=16, step_quant=True)
packed = pack_binary_tree(btris, *orc.export_tree(), leaf_size=16)
rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                          side, side, order="morton")
log(f"rays {rays.count} topology sahq-k16")

ref_t = ref_slot = None
for defer in (False, True):
    out = trace_packets(packed, rays, sort_rays=False, dual=True,
                        ordered=True, defer_uv=defer)
    t = np.asarray(out.t)
    slot = np.asarray(out.slot)
    n_hit = int((slot >= 0).sum())
    if ref_t is None:
        ref_t, ref_slot = t, slot
        log(f"defer={defer}: {n_hit} hits (reference)")
    else:
        log(f"defer={defer}: {n_hit} hits, t bit-equal: "
            f"{np.array_equal(t, ref_t)}, slot bit-equal: "
            f"{np.array_equal(slot, ref_slot)}")
    del out, t, slot
    nxt = bench.vary_rays(rays, m=8)
    dt = bench.timeit(
        lambda: trace_packets(packed, nxt(), sort_rays=False, dual=True,
                              ordered=True, defer_uv=defer),
        iters=3, batches=2, warm=True)
    log(f"defer={defer}: {dt*1e3:.1f} ms  {rays.count/dt/1e6:.1f} Mrays/s")
