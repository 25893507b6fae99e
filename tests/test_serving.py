"""Serving runtime: batching/bucketing correctness vs the product pose path.

The server must be a pure transport: whatever (frame, bbox) sequence clients
submit, the scores/angles coming back must equal the batch Predictor path
(pipeline.run_from_frames + the scoring engines) on the same inputs --
batching, bucket padding, and deadline coalescing are not allowed to touch
numerics.
"""

import json
import os.path as osp
import threading

import numpy as np
import pytest

import poserisk_release_tpu as _pkg
from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.serving import PoseScoringServer, ScoredPose

INFO = json.load(
    open(osp.join(osp.dirname(_pkg.__file__), "default_information.json")))
HW = (64, 96)


def _cfg():
    # Small crops + tiny chunk: keeps the suite's compile cost down; the
    # whole stack is resolution-polymorphic.
    return default_config().replace(MODEL={"input_shape": (64, 64)},
                                    PARALLEL={"frames_per_step": 4})


def _requests(n, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, *HW, 3), dtype=np.uint8)
    boxes = np.stack([
        np.array([48.0 + i, 32.0, 20.0 + i, 24.0], np.float32)
        for i in range(n)
    ])
    return frames, boxes


@pytest.fixture(scope="module")
def server():
    srv = PoseScoringServer(
        cfg=_cfg(), batch_sizes=(1, 4), max_delay_ms=500.0,
        frame_hw=HW, warm=True)
    yield srv
    srv.close()


def test_single_request_matches_product_path(server):
    frames, boxes = _requests(1)
    res = server.score(frames[0], boxes[0], timeout=120)
    assert isinstance(res, ScoredPose)

    from poserisk_release_tpu.scoring.reba import REBAScorer
    from poserisk_release_tpu.scoring.rula import RULAScorer

    # chunk=1 matches the server's 1-bucket batch shape; across DIFFERENT
    # batch shapes XLA's reduction order shifts euler by ~1e-4 deg (the
    # repo-wide documented class -- same as the batch pipeline across chunk
    # sizes), which random synthetic weights make visible.
    euler, joint_cam, _aa = server.estimator.run_from_frames(
        frames, np.arange(1), boxes, chunk=1)
    assert res.reba == REBAScorer()(euler, joint_cam, INFO)[0]["score"]
    assert res.rula == RULAScorer()(euler, joint_cam, INFO)[0]["score"]
    np.testing.assert_allclose(res.euler_deg, euler[0], atol=1e-4)
    np.testing.assert_allclose(res.joint_cam_mm, joint_cam[0], atol=1e-3)


def test_coalesced_batch_pads_to_bucket_and_matches(server):
    """3 concurrent requests coalesce into ONE padded bucket-4 batch whose
    per-request results equal the product path on each request alone."""
    frames, boxes = _requests(3, seed=1)
    before = server.stats()["batches"]
    futures = [server.submit(frames[i], boxes[i]) for i in range(3)]
    results = [f.result(timeout=120) for f in futures]
    stats = server.stats()
    # One batch for the three requests (500 ms deadline >> submit spacing),
    # padded to the 4-bucket.
    new = stats["batch_fill"][before:]
    assert new == [(3, 4)]
    assert stats["requests"] >= 3

    from poserisk_release_tpu.scoring.reba import REBAScorer
    from poserisk_release_tpu.scoring.rula import RULAScorer

    # chunk=4 pads 3 frames to 4 by edge-repeat -- the exact padded batch
    # the server ran (bucket padding repeats the last request).
    euler, joint_cam, _aa = server.estimator.run_from_frames(
        frames, np.arange(3), boxes, chunk=4)
    reba = [r["score"] for r in REBAScorer()(euler, joint_cam, INFO)]
    rula = [r["score"] for r in RULAScorer()(euler, joint_cam, INFO)]
    for i, res in enumerate(results):
        assert (res.reba, res.rula) == (reba[i], rula[i])
        np.testing.assert_allclose(res.euler_deg, euler[i], atol=1e-4)


def test_threaded_submits_all_resolve(server):
    frames, boxes = _requests(4, seed=2)
    out = [None] * 4

    def worker(i):
        out[i] = server.score(frames[i], boxes[i], timeout=120)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(isinstance(r, ScoredPose) for r in out)
    # Same request content => same result regardless of which batch/bucket
    # each landed in.
    again = server.score(frames[0], boxes[0], timeout=120)
    assert (again.reba, again.rula) == (out[0].reba, out[0].rula)


def test_shape_and_dtype_contract(server):
    frames, boxes = _requests(1)
    with pytest.raises(ValueError, match="frame shape"):
        server.submit(np.zeros((32, 32, 3), np.uint8), boxes[0])
    with pytest.raises(ValueError, match="uint8"):
        server.submit(frames[0].astype(np.float32), boxes[0])
    with pytest.raises(ValueError):
        server.submit(frames[0], np.zeros((2,), np.float32))


def test_constructor_contracts():
    with pytest.raises(ValueError, match="batch_sizes"):
        PoseScoringServer(cfg=_cfg(), batch_sizes=(4, 1), warm=False)
    with pytest.raises(ValueError, match="pose_stride"):
        PoseScoringServer(
            cfg=_cfg().replace(SPIN={"pose_stride": 2}), warm=False)


def test_latency_metrics_populated(server):
    stats = server.stats()
    assert stats["requests"] >= 1
    assert stats["latency_p50"] > 0
    assert stats["latency_p99"] >= stats["latency_p50"]


def test_spin_int8_warmup_never_calibrates_on_zeros():
    """Warm-up frames are black; letting them pin the int8 activation
    scales would silently degrade every later request. Calibration must
    wait for the first REAL batch (or explicit calibration_crops)."""
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(1,), frame_hw=HW,
                            warm=True, spin_int8=True)
    try:
        assert srv.estimator.spin_needs_calibration  # zeros did NOT calibrate
        frames, boxes = _requests(1, seed=3)
        res = srv.score(frames[0], boxes[0], timeout=180)
        assert not srv.estimator.spin_needs_calibration  # real batch did
        assert isinstance(res, ScoredPose)
        # The rebuilt (quantized) bucket graphs keep serving consistently.
        again = srv.score(frames[0], boxes[0], timeout=180)
        assert (again.reba, again.rula) == (res.reba, res.rula)
    finally:
        srv.close()


def test_spin_int8_explicit_calibration_crops():
    frames, boxes = _requests(1, seed=4)
    rng = np.random.default_rng(5)
    calib = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(1,), frame_hw=HW,
                            warm=False, spin_int8=True,
                            calibration_crops=calib)
    try:
        # Scales came from the provided crops, before any request.
        assert not srv.estimator.spin_needs_calibration
        res = srv.score(frames[0], boxes[0], timeout=180)
        assert isinstance(res, ScoredPose)
    finally:
        srv.close()


def test_closed_server_rejects_and_close_is_idempotent():
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(1,), frame_hw=HW,
                            warm=False)
    srv.close()
    srv.close()
    frames, boxes = _requests(1)
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(frames[0], boxes[0])


def test_prefailed_future_does_not_poison_its_batch():
    """The close()/submit() race can leave one request's future already
    failed by the time the dispatcher delivers its batch. set_result on that
    done future would raise InvalidStateError, and the generic exception
    handler would then discard the OTHER requests' successfully computed
    results. The dispatcher must skip done futures instead."""
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(4,), frame_hw=HW,
                            warm=True, max_delay_ms=0.0)
    # Park the construction-time dispatcher so both requests land in the
    # queue BEFORE any batch is collected (deterministic same-batch setup).
    srv._closed.set()
    srv._thread.join(timeout=10)
    srv._closed.clear()

    frames, boxes = _requests(2, seed=6)
    fut_raced = srv.submit(frames[0], boxes[0])
    fut_ok = srv.submit(frames[1], boxes[1])
    fut_raced.set_exception(RuntimeError("raced with close"))

    t = threading.Thread(target=srv._dispatch_loop, daemon=True)
    t.start()
    try:
        res = fut_ok.result(timeout=180)  # must NOT inherit InvalidStateError
        assert isinstance(res, ScoredPose)
        with pytest.raises(RuntimeError, match="raced"):
            fut_raced.result(timeout=10)
    finally:
        srv._closed.set()
        t.join(timeout=10)
        srv.close()


def test_submit_racing_close_never_leaves_a_hung_future():
    """If close() runs between submit()'s entry check and its queue put, the
    request lands in a queue close() has already drained -- nothing would
    ever resolve the future, and a score() caller with no timeout would
    block forever. submit() must fail the future itself in that case."""
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(1,), frame_hw=HW,
                            warm=False)
    frames, boxes = _requests(1)
    real_put = srv._queue.put

    def close_then_put(item):  # deterministic worst-case interleaving
        srv.close()
        real_put(item)

    srv._queue.put = close_then_put
    fut = srv.submit(frames[0], boxes[0])
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=10)
