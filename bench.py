"""Benchmark suite over the BASELINE.json acceptance configs (single chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — the
headline is primary-ray closest-hit throughput on the bunny-class scene
(config 2), vs the 500 Mrays/s north-star target.  Per-config numbers go to
stderr.  Procedural stand-ins replace the named assets (no network here):
blob(6)=81,920 tris for the 69k bunny; atrium≈410k tris for 262k Sponza.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_MRAYS = 500.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_for_device(deadline_s=1800, probe_every_s=60):
    """Block until the device backend answers a trivial dispatch.

    The axon TPU tunnel has outages measured in hours; if the driver's
    bench run lands in one, failing instantly records nothing for the
    round.  Probe in a SUBPROCESS (a hung in-process backend init cannot
    be recovered) and give the tunnel up to `deadline_s` to return.
    Proceeds after the deadline either way — a late failure is at least
    an honest failure.
    """
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()")
    t0 = time.perf_counter()
    while True:
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=120,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        waited = time.perf_counter() - t0
        if waited > deadline_s:
            log(f"device probe still failing after {waited:.0f}s — "
                f"proceeding anyway")
            return False
        log(f"device probe failed (rc={rc}); retrying "
            f"({waited:.0f}/{deadline_s}s)")
        time.sleep(probe_every_s)


def _enable_compile_cache():
    """Persistent XLA compilation cache shared across bench processes.

    Tunnel compiles cost 3-40 s; the headline K-candidates each run in a
    child process and would re-pay them.  A shared on-disk cache makes the
    second process (and the next round's bench) load executables instead."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/rtk_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")


def timeit(fn, iters=5, batches=3, warm=False):
    """Best-of-batches timing: the remote-device tunnel has bursty latency,
    so the minimum batch average is the honest device-throughput number.
    warm=True skips the warm-up call (the caller already ran fn once)."""
    import jax

    if not warm:
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


HEADLINE_CANDIDATES = {
    # label: (leaf_size, trace kwargs, topology)
    "k8": (8, {}, "lbvh"),
    "k16": (16, {}, "lbvh"),
    "k16-ordered": (16, dict(ordered=True), "lbvh"),
    "k32": (32, {}, "lbvh"),
    # Host-native binned-SAH topology through the identical kernel:
    # measured +40% over LBVH at 67M (229 vs 164 Mrays/s, PERF_NOTES r2
    # TPU) — dense 8192^2 packets reward low-area SAH cuts even though
    # 512^2 step counts predicted the opposite.
    "sah-k8": (8, {}, "sah"),
    "sah-k16": (16, {}, "sah"),
    "sah-k32": (32, {}, "sah"),
}


def _headline_candidate(label, packed=None):
    """Measure ONE 67M-ray headline candidate; (n_rays, Mrays/s, n_hit).

    The CPU step predictor (PERF_NOTES r2) has K=16 at -31% steps (-37%
    ordered) and K=32 at -56% where the leaf phase is 57% of the frame;
    measuring the candidates keeps the predicted win even if the staged
    sweep never got chip time.  Runs standalone via
    `bench.py --headline-candidate <label>` so each candidate's multi-GB
    buffers and tunnel compiles live in a bounded child process."""
    import jax.numpy as jnp

    from rtk_tpu import BuildConfig
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene
    from rtk_tpu.testing import scenes

    k, kw, topo = HEADLINE_CANDIDATES[label]
    if topo == "sah":
        from rtk_tpu.testing.native_oracle import NativeOracle
        from rtk_tpu.trace.packed import pack_binary_tree

        btris = scenes.blob(subdivisions=6)[0]
        orc = NativeOracle(btris.reshape(-1, 9), leaf_max=k)
        packed = pack_binary_tree(btris, *orc.export_tree(), leaf_size=k)
    elif packed is None:
        btris = scenes.blob(subdivisions=6)[0]
        packed = pack_scene(build_from_soup(
            jnp.asarray(btris),
            config=BuildConfig(branching=8, leaf_size=k)))
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              8192, 8192, order="morton")
    run = lambda: trace_packets(packed, rays, sort_rays=False, dual=True,
                                **kw)
    out = run()  # warm-up; doubles as the hit-count parity sample
    n_hit = int(np.asarray(out.hit).sum())
    del out
    dt = timeit(run, iters=3, batches=2, warm=True)
    return rays.count, rays.count / dt / 1e6, n_hit


def main():
    wait_for_device()
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from rtk_tpu import BuildConfig, Rays, refit
    from rtk_tpu.ops.pallas_trace import trace_packets
    from rtk_tpu.scene import build_from_soup
    from rtk_tpu.trace.packed import pack_scene, repack_bounds
    from rtk_tpu.testing import scenes

    log(f"device: {jax.devices()[0]}")
    cfg = BuildConfig(branching=8, leaf_size=8)

    # ---- build throughput FIRST: after any Pallas launch this runtime
    # charges every dispatch a fixed multi-ms penalty, which would swamp a
    # sub-millisecond build ----
    btris = scenes.blob(subdivisions=6)[0]  # 81,920 tris
    btris_dev = jax.block_until_ready(jnp.asarray(btris))
    dt = timeit(lambda: build_from_soup(btris_dev, config=cfg), iters=10)
    log(f"build: {btris.shape[0]} tris in {dt*1e3:.2f} ms "
        f"({btris.shape[0]/dt/1e6:.1f} Mtris/s)")

    # ---- config 1: Cornell box primary rays ----
    tris = scenes.cornell_box()
    scene = build_from_soup(jnp.asarray(tris))
    packed = pack_scene(scene)
    rays = scenes.cornell_camera(256, 256)
    dt = timeit(lambda: trace_packets(packed, rays))
    log(f"cornell 256x256 primary: {rays.count/dt/1e6:.2f} Mrays/s")

    # ---- config 2: bunny-class primary + shadow (headline) ----
    scene = build_from_soup(btris_dev, config=cfg)
    packed = pack_scene(scene)
    rays512 = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                                 512, 512, order="morton")
    dt = timeit(lambda: trace_packets(packed, rays512, sort_rays=False,
                                      dual=True), iters=5)
    log(f"bunny 512x512 primary: {rays512.count/dt/1e6:.2f} Mrays/s "
        f"({dt*1e3:.1f} ms incl. per-dispatch overhead)")
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              1024, 1024, order="morton")
    dt = timeit(lambda: trace_packets(packed, rays, sort_rays=False,
                                      dual=True), iters=5)
    log(f"bunny 1024x1024 primary: {rays.count} rays in {dt*1e3:.1f} ms "
        f"-> {rays.count/dt/1e6:.2f} Mrays/s")
    # Headline at 67M rays: throughput grows with batch size (ray density
    # tightens each packet's traversal union and the auto packet width
    # scales up), so the biggest batch reflects sustained chip throughput.
    # The packed leaf size is auto-selected (_headline_candidate docstring);
    # parity across K is covered by the fuzz suite, the hit-count check
    # here just catches gross breakage on this batch.
    # K=8 (the r1-proven config) runs in-process and is the guaranteed
    # baseline; the K=16/32 candidates each run in their OWN bounded
    # subprocess (CLAUDE.md: 67M-ray configs leave multi-GB HBM buffers and
    # a hung remote compile cannot be recovered in-process).
    n_rays67, cand67, n_hit_ref = _headline_candidate("k8", packed=packed)
    mrays = cand67
    log(f"bunny 8192x8192 primary [k8]: {n_rays67} rays "
        f"-> {mrays:.2f} Mrays/s")
    import gc
    import subprocess

    gc.collect()  # drop the k8 67M-ray/hit device buffers before spawning
    for label in ("k16", "k16-ordered", "k32"):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--headline-candidate", label],
                timeout=900, capture_output=True, text=True)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
        except Exception as e:
            log(f"bunny 8192x8192 [{label}] failed: {type(e).__name__}: {e}")
            continue
        if rec["n_hit"] != n_hit_ref:
            log(f"bunny 8192x8192 [{label}]: hit-count mismatch "
                f"({rec['n_hit']} vs {n_hit_ref}) — candidate rejected")
            continue
        log(f"bunny 8192x8192 primary [{label}]: {rec['mrays']:.2f} Mrays/s")
        mrays = max(mrays, rec["mrays"])
    log(f"bunny 8192x8192 primary: {mrays:.2f} Mrays/s (headline, best K)")
    rays = scenes.camera_rays((0, 0, 3.0), (0, 0, 0), (0, 1, 0), 45,
                              2048, 2048, order="morton")
    hits = trace_packets(packed, rays, sort_rays=False, dual=True)
    p = np.asarray(hits.position())
    light = np.array([3.0, 4.0, 2.0], np.float32)
    d = light[None] - p
    dist = np.linalg.norm(d, axis=1)
    shadow = Rays.make(p, d / np.maximum(dist[:, None], 1e-9), min_t=1e-3,
                       max_t=np.where(np.asarray(hits.hit), dist, 0.0))
    dt = timeit(lambda: trace_packets(packed, shadow, mode="any"),
                iters=5)
    log(f"bunny shadow (any-hit, 4M rays, ~60% dead): "
        f"{shadow.count/dt/1e6:.2f} Mrays/s")
    # Renderer-realistic variant: shadow rays exist only for hit pixels
    # (miss pixels spawn none) — compacted on device.
    live = np.asarray(hits.hit)
    nlive = int(live.sum())
    mlive = max(1024, 1 << int(np.ceil(np.log2(max(nlive, 1)))))
    order = np.argsort(~live, kind="stable")[:mlive]
    shadow_c = Rays.make(p[order], (d / np.maximum(dist[:, None], 1e-9))[order],
                         min_t=1e-3,
                         max_t=np.where(live[order], dist[order], 0.0))
    dt = timeit(lambda: trace_packets(packed, shadow_c, mode="any"),
                iters=5)
    log(f"bunny shadow compacted ({nlive} live rays): "
        f"{nlive/dt/1e6:.2f} Mrays/s")

    # ---- reference CPU baseline: the corrected-rtk C++ oracle on the same
    # bunny config (single thread; rtk scales queries linearly with host
    # threads, rtk.c:543-577 purity).  Recorded so "vs reference CPU" is a
    # measured ratio, not a guess (VERDICT r1 item 9). ----
    try:
        from rtk_tpu.testing.native_oracle import NativeOracle

        orc = NativeOracle(btris.reshape(-1, 9))
        r512 = rays512
        o_np = np.asarray(r512.origin)
        d_np = np.asarray(r512.direction)
        t0 = time.perf_counter()
        _, _, _, idx = orc.trace(o_np, d_np, np.asarray(r512.min_t),
                                 np.asarray(r512.max_t))
        cpu_dt = time.perf_counter() - t0
        import os as _os

        cpu_mrays = r512.count / cpu_dt / 1e6
        log(f"reference-CPU oracle (corrected rtk, scalar BVH2, "
            f"{_os.cpu_count()} core): {cpu_mrays:.2f} Mrays/s "
            f"-> TPU/CPU-core ratio {mrays/cpu_mrays:.0f}x")
    except Exception as e:
        log(f"reference-CPU oracle baseline unavailable: {e}")

    # ---- config 3: Sponza-class 1-bounce diffuse ----
    atr = scenes.atrium()
    scene_a = build_from_soup(jnp.asarray(atr), config=cfg)
    packed_a = pack_scene(scene_a)
    cam = scenes.camera_rays((0, 6, 9), (0, 2, 0), (0, 1, 0), 60, 1024, 1024,
                             order="morton")
    prim = trace_packets(packed_a, cam)
    key = jax.random.PRNGKey(0)
    from rtk_tpu.models.path import cosine_sample, geometric_normal

    n = geometric_normal(prim, cam.direction)
    bounce_dir = cosine_sample(key, n)
    origin = prim.position() + 1e-3 * n
    bounce = Rays(
        origin=origin, direction=bounce_dir,
        min_t=jnp.full((cam.count,), 1e-3, jnp.float32),
        max_t=jnp.where(prim.hit, np.float32(3.4e38), 0.0))
    # K=16 packed tables for the HBM-resident atrium: halves leaf steps
    # and doubles each leaf DMA (512B -> 1KB), amortising the per-step
    # DMA issue chatter.  Measured (PERF_NOTES r2 TPU): primary 14.3 vs
    # 10.4 Mrays/s, bounce 0.32 vs 0.20 — K=16 wins both.
    packed_a16 = pack_scene(build_from_soup(
        jnp.asarray(atr), config=BuildConfig(branching=8, leaf_size=16)))
    dt = timeit(lambda: trace_packets(packed_a16, cam, sort_rays=False,
                                      dual=True), iters=3)
    log(f"atrium ({atr.shape[0]} tris) primary: {cam.count/dt/1e6:.2f} Mrays/s")
    dt = timeit(lambda: trace_packets(packed_a16, bounce, dual=True), iters=2,
                batches=2)
    log(f"atrium incoherent bounce: {cam.count/dt/1e6:.2f} Mrays/s")
    # Incoherent-ray engine v2 on the same batch: macro-grid DDA
    # re-binning (disjoint cells, exact residual).  Coarse dims converge
    # fastest on this batch (CPU count profile, PERF_NOTES r2).
    try:
        from rtk_tpu.trace.grid import (build_grid_from_scene,
                                        calibrate_caps, trace_packets_grid)

        g = build_grid_from_scene(scene_a, packed=packed_a, dims=(7, 3, 7))
        caps = calibrate_caps(g, bounce, rounds=8, skips=4)
        dt = timeit(lambda: trace_packets_grid(g, bounce, rounds=8,
                                               skips=4, caps=caps),
                    iters=2, batches=2)
        log(f"atrium bounce via grid engine: {cam.count/dt/1e6:.2f} Mrays/s")
    except Exception as e:
        log(f"grid-engine bounce entry failed: {type(e).__name__}: {e}")

    # ---- config 4: deforming mesh refit + trace loop ----
    grid0 = scenes.deforming_grid(0.0, n=96)  # 18,432 tris
    scene_d = build_from_soup(jnp.asarray(grid0), config=cfg)
    packed_d = pack_scene(scene_d)
    frames = [jnp.asarray(scenes.deforming_grid(t, n=96))
              for t in (0.1, 0.2, 0.3)]
    cam_d = scenes.camera_rays((0, 3, 4), (0, 0, 0), (0, 1, 0), 50, 256, 256,
                               order="morton")

    from rtk_tpu.ops.pallas_trace import trace_packets_refit

    def frame(i):
        # one fused device program: refit -> repack -> trace
        hits, _, _ = trace_packets_refit(packed_d, scene_d, frames[i % 3],
                                         cam_d, sort_rays=False)
        return hits

    dt = timeit(lambda: frame(1), iters=5)
    log(f"deforming refit+trace: {dt*1e3:.1f} ms/frame "
        f"({grid0.shape[0]/dt/1e6:.1f} Mtris/s refit incl. trace)")

    # Animation sub-stepping executor: scan F frames inside ONE program —
    # the honest amortisation of the fixed per-dispatch cost for clips.
    from rtk_tpu.ops.pallas_trace import trace_packets_refit_frames

    F = 8
    clip = jnp.stack([jnp.asarray(scenes.deforming_grid(0.05 * i, n=96))
                      for i in range(F)])
    dt = timeit(lambda: trace_packets_refit_frames(
        packed_d, scene_d, clip, cam_d, sort_rays=False)[-1],
        iters=3, batches=2)
    log(f"deforming refit+trace, {F}-frame scan: {dt/F*1e3:.1f} ms/frame "
        f"amortised ({grid0.shape[0]*F/dt/1e6:.1f} Mtris/s)")

    # ---- config 5: 10M+ instanced tris, TLAS/BLAS, 4-bounce wavefront ----
    from rtk_tpu.instancing import (build_instanced, pack_instanced,
                                    trace_closest_instanced_packets)
    from rtk_tpu.models.path import cosine_sample, geometric_normal

    blas_tris = scenes.blob(subdivisions=6)[0]  # 81,920 tris
    blas = build_from_soup(jnp.asarray(blas_tris), config=cfg)
    n_inst = 125  # 125 x 81,920 = 10.24M instanced triangles
    side = 5
    tf = np.zeros((n_inst, 3, 4), np.float32)
    rng5 = np.random.default_rng(7)
    for i in range(n_inst):
        gx, gy, gz = i % side, (i // side) % side, i // (side * side)
        sc = 0.35 + 0.15 * rng5.random()
        tf[i, :, :3] = np.eye(3, dtype=np.float32) * sc
        tf[i, :, 3] = (np.array([gx, gy, gz], np.float32) * 1.1
                       + rng5.random(3).astype(np.float32) * 0.2)
    iscene = build_instanced([blas], np.zeros(n_inst, np.int64), tf)
    pscene = pack_instanced(iscene)
    cam5 = scenes.camera_rays((7, 6.5, 8), (2.2, 2.2, 2.2), (0, 1, 0), 55,
                              512, 512, order="morton")
    key5 = jax.random.PRNGKey(5)
    CAND5 = 4  # nearest-candidate rounds per trace (bounds compiles)
    n5 = cam5.count

    import functools

    scene_lo5 = jnp.asarray(tf[:, :, 3].min(axis=0) - 1.0)
    scene_hi5 = jnp.asarray(tf[:, :, 3].max(axis=0) + 2.0)

    @jax.jit
    def _bounce_prep(hits, rays_b, kd):
        # Shade/sample + compaction permutation, all on device: live rays
        # to the front (Morton-keyed within the live run), dead behind.
        nrm = geometric_normal(hits, rays_b.direction)
        nd = cosine_sample(kd, nrm)
        origin = hits.position() + 1e-3 * nrm
        alive = hits.hit
        from rtk_tpu.models.path import _ray_sort_key

        key32 = _ray_sort_key(
            Rays(origin=origin, direction=nd,
                 min_t=rays_b.min_t, max_t=rays_b.max_t),
            scene_lo5, scene_hi5)
        order = ((~alive).astype(jnp.uint32) << 28) | (key32 >> 4)
        perm = jnp.argsort(order, stable=True)
        return nd, origin, perm, jnp.sum(alive)

    @functools.partial(jax.jit, static_argnames=("m",))
    def _take_rays(origin, nd, perm, n_alive, *, m):
        take = lambda a: jnp.take(a, perm[:m], axis=0)
        live = jnp.arange(m) < n_alive
        return Rays(
            origin=take(origin), direction=take(nd),
            min_t=jnp.full((m,), 1e-3, jnp.float32),
            max_t=jnp.where(live, np.float32(3.4e38), 0.0))

    def wavefront4():
        # Per-bounce: trace -> fused device shade/sample/compact; the only
        # host sync is the live-count scalar that picks the pow2 bucket
        # (VERDICT r1 item 4: the old loop materialised hit masks and
        # built gather indices on host every bounce).
        rays_b = cam5
        total = rays_b.count
        k = key5
        hits, _ = trace_closest_instanced_packets(pscene, rays_b,
                                                  max_candidates=CAND5)
        for bounce in range(3):
            k, kd = jax.random.split(k)
            nd, origin, perm, n_alive_dev = _bounce_prep(hits, rays_b, kd)
            n_alive = int(n_alive_dev)
            if n_alive == 0:
                break
            m = min(rays_b.count,
                    max(1024, 1 << int(np.ceil(np.log2(n_alive)))))
            rays_b = _take_rays(origin, nd, perm, n_alive_dev, m=m)
            hits, _ = trace_closest_instanced_packets(pscene, rays_b,
                                                      max_candidates=CAND5)
            total += n_alive
        jax.block_until_ready(hits.t)
        return total

    total5 = wavefront4()  # warm-up compiles all round shapes
    import time as _time
    t1 = _time.perf_counter()
    wavefront4()
    best5 = _time.perf_counter() - t1
    log(f"instanced 10.2M tris (125 x 82k BLAS) 4-bounce wavefront: "
        f"{total5} rays in {best5*1e3:.0f} ms -> {total5/best5/1e6:.2f} Mrays/s")

    print(json.dumps({
        "metric": "primary_ray_closest_hit_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--headline-candidate":
        _enable_compile_cache()
        _label = sys.argv[2]
        _n, _mrays, _n_hit = _headline_candidate(_label)
        print(json.dumps({"label": _label, "mrays": round(_mrays, 3),
                          "n_hit": _n_hit}))
    else:
        main()
