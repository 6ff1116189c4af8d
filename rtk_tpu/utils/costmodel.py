"""Fitted packet-kernel cost model (the batch-sizing subsystem).

The reference exposes per-task cost estimates as host-scheduler hints
(rtk.h:112, constants rtk.c:1664-1667); the TPU analogue is a model of
the Pallas packet kernel's per-step cost, fitted from a (P, PKT) sweep
on v5e (docs/PERF_NOTES.md "Cost model"):

    t_step = A * P + B * P * PKT + C          [microseconds]

A: per-packet scalar chain (stack-row load -> lane extract -> scalar
   node id -> stage copy).  B: per-ray vector work (slab + leaf phases
   + carry spills).  C: fixed per-step cost (phase conds, packed count
   syncs, loop carry).

Two regimes fall out of the fit:
- narrow packets (PKT <~ 512): step-latency bound (A*P + C dominate) —
  more rays per packet are nearly free, so widen until the union cost
  bites;
- wide packets (PKT >= 2048): vector bound (B*P*PKT dominates) — the
  leaf/slab arithmetic is the frame, and further widening only pays
  while ray density keeps tightening each packet's traversal union.

`auto_pkt` encodes the measured crossover points; `predict_step_us` and
`predict_trace_ms` expose the raw model for planning (e.g. deciding
whether a workload is dispatch-bound before batching it up).
"""
from __future__ import annotations

import dataclasses

# Fitted on TPU v5e, bunny-class scene (81,920 tris, leaf_size 8,
# branching 8), 1M Morton-ordered primary rays (PERF_NOTES 2026-08).
A_US = 0.11
B_US = 2.9e-4
C_US = 0.8

# Fixed per-dispatch cost of the remote runtime (ms); dominates tiny
# batches (Cornell 256^2 measured ~7 ms total).
DISPATCH_MS = 3.0


@dataclasses.dataclass(frozen=True)
class StepModel:
    """t_step(P, PKT) in microseconds plus derived whole-trace estimates."""

    a_us: float = A_US
    b_us: float = B_US
    c_us: float = C_US

    def step_us(self, p: int, pkt: int) -> float:
        return self.a_us * p + self.b_us * p * pkt + self.c_us

    def trace_ms(self, n_rays: int, pkt: int, steps_per_block: float,
                 p: int = 8) -> float:
        """Predicted wall time for one fused trace dispatch.

        steps_per_block: per-scene traversal depth statistic (measure
        with trace_packets(stats=True); bunny-class primaries run ~31-37
        across packet widths because unions are footprint-bound).
        """
        blocks = max(1, n_rays // (p * pkt))
        return blocks * steps_per_block * self.step_us(p, pkt) / 1e3 \
            + DISPATCH_MS


def auto_pkt(n_rays: int, p: int = 8) -> int:
    """Measured-best packet width for a ray batch (v5e sweep).

    Throughput keeps growing with batch size (denser rays tighten each
    packet's traversal union AND wider packets amortise A/C), so the
    width steps up with the batch: 512 -> 1024 @4M -> 2048 @32M rays
    (67M measured 157 @2048 vs 112 @512 Mrays/s).
    """
    if n_rays >= 32 * 1024 * 1024:
        return 2048
    if n_rays >= 4 * 1024 * 1024:
        return 1024
    if n_rays >= p * 512:
        return 512
    return 128


def dispatch_bound(n_rays: int, pkt: int | None = None,
                   steps_per_block: float = 34.0) -> bool:
    """True when fixed dispatch cost exceeds predicted device time —
    the caller should batch more rays per call (PERF_NOTES batch-size
    scaling), not tune the kernel."""
    pkt = auto_pkt(n_rays) if pkt is None else pkt
    model = StepModel()
    device_ms = model.trace_ms(n_rays, pkt, steps_per_block) - DISPATCH_MS
    return device_ms < DISPATCH_MS
