"""Isolate trace-path costs: raw kernel vs full trace (assembly, sort)."""
from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters=5, batches=3):
    import jax

    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from rtk_tpu import BuildConfig
    from rtk_tpu.ops import pallas_trace as PT
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)
    btris = scenes.blob(subdivisions=6)[0]
    scene = build_from_soup(jnp.asarray(btris), config=cfg)
    packed = pack_scene(scene)
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    n = rays.count
    p_pk, pkt = 8, 512

    o = jnp.asarray(rays.origin)
    d = jnp.asarray(rays.direction)
    comps = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.asarray(rays.min_t), jnp.asarray(rays.max_t))
    comps = tuple(jax.block_until_ready(c.reshape(n // pkt, pkt))
                  for c in comps)
    roots = jnp.zeros((n // pkt,), jnp.int32)

    # (a) a trivial pallas kernel: measures fixed dispatch overhead
    from jax.experimental import pallas as pl

    def triv(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    trivf = jax.jit(lambda x: pl.pallas_call(
        triv, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x))
    dt = timeit(lambda: trivf(x), iters=10)
    log(f"trivial pallas dispatch: {dt*1e3:.2f} ms")

    dt = timeit(lambda: jax.jit(lambda y: y + 1.0)(x), iters=10)
    log(f"trivial XLA dispatch: {dt*1e3:.2f} ms")

    # (b) raw kernel only
    def raw():
        qmask = jnp.full((1,), 0xFFFFFF, jnp.int32)
        kzs = jnp.zeros((roots.shape[0],), jnp.int32)
        return PT._run_kernel(
            packed.nodes, packed.tris, comps, roots, qmask, kzs,
            mode="closest",
            watertight=True, interpret=False, num_tris=packed.num_tris,
            leaf_size=packed.leaf_size, p_pk=p_pk, pkt=pkt)

    dt = timeit(raw)
    log(f"raw kernel: {dt*1e3:.2f} ms -> {n/dt/1e6:.2f} Mrays/s")

    # (c) full trace, no sort
    dt = timeit(lambda: PT.trace_packets(packed, rays, sort_rays=False))
    log(f"full trace (no sort): {dt*1e3:.2f} ms -> {n/dt/1e6:.2f} Mrays/s")

    # (d) full trace with coherence sort
    dt = timeit(lambda: PT.trace_packets(packed, rays, sort_rays=True))
    log(f"full trace (sorted): {dt*1e3:.2f} ms -> {n/dt/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
