"""Smoke tests for tools/bench_reference_hotloop.py (the measured baseline).

The tool restates the reference's post-detection hot loop
(/root/reference/lib/core/base.py:211-240 + the scoring loops) from the same
oracle modules the parity suite trusts; these tests prove its non-trivial
paths run and return sane structure on a tiny frame count, so the measured
BASELINE.md row is regenerable from any checkout.
"""

import numpy as np

from tools.bench_reference_hotloop import measure_reference


def test_measure_reference_smoke():
    out = measure_reference(frames=2, batch=2, seed=0)
    assert out["fps"] > 0
    assert out["elapsed_s"] > 0
    stages = out["stages_s"]
    assert set(stages) == {"spin", "conversions", "joint_cam", "scoring"}
    # Every stage does real work (non-zero time) and the total dominates
    # the sum of parts (no stage double-counted).
    assert all(v > 0 for v in stages.values())
    assert out["elapsed_s"] >= sum(stages.values()) * 0.99


def test_measure_ours_cpu_smoke():
    # The --with-ours arm: the fused pose+score step on XLA:CPU. Tiny frame
    # count; compile time is reported separately and excluded from fps.
    from tools.bench_reference_hotloop import measure_ours_cpu

    out = measure_ours_cpu(frames=2, seed=0)
    assert out["fps"] > 0 and np.isfinite(out["fps"])
    assert out["compile_s"] > 0


def test_measure_reference_batch_tail():
    # frames not divisible by batch exercises the ragged last chunk the
    # reference DataLoader also produces (drop_last defaults False).
    out = measure_reference(frames=3, batch=2, seed=1)
    assert out["fps"] > 0
    assert np.isfinite(out["fps"])
