"""TPU: kz tables / paired pops / width at the 67M headline config.

Each variant runs in its own subprocess: a 67M-ray variant leaves
multi-GB buffers behind and a second config in the same process dies of
HBM RESOURCE_EXHAUSTED; subprocesses also isolate hung remote compiles.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

VARIANTS = {
    "base": "dict(dual=True, pair_pops=False)",
    "pair": "dict(dual=True, pair_pops=True)",
    "kz": "dict(dual=True, pair_pops=False)",
    "kz_pair": "dict(dual=True, pair_pops=True)",
    "onepop": "dict(dual=True, pair_pops=False, lesion='onepop')",
    "kz_pair_4096": "dict(dual=True, pair_pops=True, pkt=4096)",
    "kz_pair_1024": "dict(dual=True, pair_pops=True, pkt=1024)",
    "stats": "dict(dual=True, pair_pops=False, stats=True)",
}

ONE = r'''
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from rtk_tpu import BuildConfig
from rtk_tpu.ops.pallas_trace import trace_packets
from rtk_tpu.scene import build_from_soup
from rtk_tpu.trace.packed import pack_scene
from rtk_tpu.testing import scenes

name, side = sys.argv[1], int(sys.argv[2])
kz = name.startswith("kz")
kw = eval(sys.argv[3])
btris = scenes.blob(subdivisions=6)[0]
scene = build_from_soup(jnp.asarray(btris),
                        config=BuildConfig(branching=8, leaf_size=8))
packed = pack_scene(scene, kz_tables=kz)
del scene
rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                          side, side, order="morton")
n = rays.count
stats = kw.pop("stats", False)
if stats:
    _, steps = trace_packets(packed, rays, sort_rays=False, stats=True,
                             **kw)
    st = np.asarray(steps)
    print(f"RESULT {name} steps mean={st.mean():.1f} max={st.max()}",
          flush=True)
    sys.exit(0)
out = trace_packets(packed, rays, sort_rays=False, **kw)
jax.block_until_ready(out.t)
hits = int(np.asarray(out.hit).sum())
best = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(3):
        out = trace_packets(packed, rays, sort_rays=False, **kw)
    jax.block_until_ready(out.t)
    best = min(best, (time.perf_counter() - t0) / 3)
print(f"RESULT {name} {best*1e3:.1f} ms {n/best/1e6:.1f} Mrays/s "
      f"hits={hits}", flush=True)
'''


def main():
    side = sys.argv[1] if len(sys.argv) > 1 else "8192"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", ONE, name, side, VARIANTS[name]],
                capture_output=True, text=True, timeout=900,
                env=dict(os.environ,
                         PYTHONPATH="/root/repo:/root/.axon_site"))
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("RESULT")]
            msg = line[0] if line else f"no result rc={r.returncode}: " + \
                r.stderr.strip().splitlines()[-1][:200] if r.stderr else ""
        except subprocess.TimeoutExpired:
            msg = f"TIMEOUT {name}"
        print(f"[{time.time()-t0:6.0f}s] {msg}", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    main()
