"""Cost-model subsystem: the fitted step model and the batch-sizing
policy trace_packets consumes (the TPU analogue of rtk's per-task cost
hints, rtk.h:112 / rtk.c:1664-1667)."""
import numpy as np

from rtk_tpu.utils.costmodel import (StepModel, auto_pkt, dispatch_bound)


def test_step_model_matches_fit_points():
    # Fit-quality anchors from the measured (P, PKT) sweep
    # (docs/PERF_NOTES.md): predictions within ~10% of measured.
    m = StepModel()
    for (p, pkt, want_us) in [(8, 512, 2.9), (16, 256, 3.8),
                              (32, 128, 5.6), (8, 1024, 3.9)]:
        got = m.step_us(p, pkt)
        assert abs(got - want_us) / want_us < 0.12, (p, pkt, got)


def test_auto_pkt_monotone_and_aligned():
    prev = 0
    for n in (1000, 8 * 512, 10**6, 4 * 2**20, 32 * 2**20, 67 * 2**20):
        pkt = auto_pkt(n)
        assert pkt % 128 == 0
        assert pkt >= prev
        prev = pkt
    assert auto_pkt(67 * 2**20) == 2048


def test_dispatch_bound_regimes():
    assert dispatch_bound(256 * 256)        # Cornell-sized: fixed cost
    assert not dispatch_bound(64 * 2**20)   # headline-sized: device time


def test_trace_ms_orders_of_magnitude():
    # 67M rays at pkt=2048: 8192^2 ray density tightens unions to ~16
    # steps/block, and the model then lands on the measured 410 ms.
    # 1M at 512 runs ~37 steps/block (measured 26 ms).
    m = StepModel()
    big = m.trace_ms(67 * 2**20, 2048, steps_per_block=16.0)
    small = m.trace_ms(2**20, 512, steps_per_block=37.0)
    assert 300 < big < 550, big
    assert 10 < small < 60, small
    assert np.isfinite(big)
