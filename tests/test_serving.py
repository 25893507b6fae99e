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


def test_serving_data_parallel_buckets():
    """PARALLEL.num_devices=2 makes the estimator build a 2-device data
    mesh and bucket batches shard across it (multi-chip serving dispatch);
    scores equal the single-device server (euler within the documented
    sharded-executable compile class)."""
    frames, boxes = _requests(4, seed=7)
    dp_cfg = _cfg().replace(PARALLEL={"num_devices": 2})
    with PoseScoringServer(cfg=_cfg(), batch_sizes=(2, 4), frame_hw=HW,
                           warm=False) as plain, \
            PoseScoringServer(cfg=dp_cfg, batch_sizes=(2, 4), frame_hw=HW,
                              warm=False) as dp:
        assert plain.estimator.mesh is None
        assert dict(dp.estimator.mesh.shape) == {"data": 2}
        for i in range(4):
            a = plain.score(frames[i], boxes[i], timeout=240)
            b = dp.score(frames[i], boxes[i], timeout=240)
            assert (a.reba, a.rula) == (b.reba, b.rula)
            np.testing.assert_allclose(a.euler_deg, b.euler_deg, atol=2e-3)


def test_serving_rounds_buckets_to_mesh_quantum():
    """Config-reachable expert/pipeline meshes: their shard_maps need every
    bucket divisible by the data axis (x stage_microbatches under pp), so
    the ladder rounds UP to the quantum at construction -- a bucket-1
    request must serve instead of crashing warm-up/dispatch."""
    frames, boxes = _requests(1, seed=8)
    ep_cfg = _cfg().replace(PARALLEL={"expert": 4, "num_devices": 2})
    with PoseScoringServer(cfg=ep_cfg, batch_sizes=(1, 4), frame_hw=HW,
                           warm=True) as srv:
        assert srv.batch_sizes == (2, 4)
        res = srv.score(frames[0], boxes[0], timeout=240)
        assert isinstance(res, ScoredPose)
    pp_cfg = _cfg().replace(PARALLEL={"stage": 4, "num_devices": 2,
                                      "stage_microbatches": 2})
    with PoseScoringServer(cfg=pp_cfg, batch_sizes=(1, 4), frame_hw=HW,
                           warm=True) as srv:
        assert srv.batch_sizes == (4,)
        res = srv.score(frames[0], boxes[0], timeout=240)
        assert isinstance(res, ScoredPose)


def test_stream_session_copies_pending_frames():
    """A caller reusing ONE capture buffer across pushes: frames waiting in
    the backfill ring must have been copied, or the later interpolation
    would score the buffer's newest pixels against old boxes."""
    import cv2

    from poserisk_release_tpu.serving import StreamSession

    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(4,), frame_hw=HW,
                            warm=True, max_delay_ms=0.0)
    try:
        def render(buf, x, shade):
            buf[:] = 25
            cv2.rectangle(buf, (x, 10), (x + 28, 54), (shade, 160, 140), -1)

        def run(reuse):
            sess = StreamSession(srv, detector=_ContentBoxDetector(),
                                 detection_stride=4, ring_capacity=16)
            buf = np.zeros((*HW, 3), np.uint8)
            futs = []
            for i in range(5):
                if reuse:
                    render(buf, 8 + i, 150 + 20 * i)
                    futs.extend(sess.push(buf))
                    buf[:] = 0  # worst case: caller recycles instantly
                else:
                    fresh = np.zeros((*HW, 3), np.uint8)
                    render(fresh, 8 + i, 150 + 20 * i)
                    futs.extend(sess.push(fresh))
            return [(i, f.result(timeout=240)) for i, f in futs]

        reused, fresh = run(True), run(False)
        assert [i for i, _ in reused] == [i for i, _ in fresh] == list(range(5))
        for (_, a), (_, b) in zip(reused, fresh):
            assert (a.reba, a.rula) == (b.reba, b.rula)
            np.testing.assert_array_equal(a.euler_deg, b.euler_deg)
    finally:
        srv.close()


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


def test_failed_bucket_fails_its_futures_and_server_recovers():
    """A device/jit failure inside one bucket run must surface on THAT
    batch's futures (with the original error) and leave the dispatcher
    alive for subsequent requests."""
    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(1,), frame_hw=HW,
                            warm=True, max_delay_ms=0.0)
    try:
        frames, boxes = _requests(2, seed=10)
        real = srv._run_bucket
        calls = {"n": 0}

        def flaky(frames_, boxes_, allow_calibration=True):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient device failure")
            return real(frames_, boxes_, allow_calibration)

        srv._run_bucket = flaky
        with pytest.raises(RuntimeError, match="transient device failure"):
            srv.score(frames[0], boxes[0], timeout=120)
        # The dispatcher survived; the next request serves normally.
        res = srv.score(frames[1], boxes[1], timeout=120)
        assert isinstance(res, ScoredPose)
    finally:
        srv.close()


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


class _ContentBoxDetector:
    """Deterministic content-derived person box (bounding box of bright
    pixels): identical results no matter how calls are batched, so the
    per-frame session path and the windowed streaming path can't fork."""

    def __call__(self, frames_rgb):
        out = []
        for f in np.asarray(frames_rgb):
            ys, xs = np.where(f.mean(axis=2) > 100)
            if len(xs) < 10:
                out.append(np.zeros((0, 5), np.float32))
            else:
                out.append(np.asarray(
                    [[xs.min(), ys.min(), xs.max(), ys.max(), 0.9]],
                    np.float32))
        return out


def _stream_clip(tmp_path, name, speed, start, n=40):
    import cv2

    from poserisk_release_tpu.io.video import read_video, write_video

    frames = []
    for i in range(n):
        img = np.full((*HW, 3), 25, np.uint8)
        x = start + speed * i
        cv2.rectangle(img, (x, 10), (x + 28, 54), (190, 160, 140), -1)
        frames.append(img)
    path = str(tmp_path / f"{name}.mp4")
    write_video(frames, fps=10.0, file_path=path)
    return path, read_video(path).frames


def test_stream_sessions_match_online_streaming(tmp_path):
    """N concurrent camera sessions over ONE shared server: each session's
    (frame, score) stream must equal the online StreamingScorer on the same
    clip — the session owns exactly the online machinery (shared
    OnlineTargetTracker), the server only batches the pose stage."""
    import threading

    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.serving import StreamSession
    from poserisk_release_tpu.streaming import StreamingScorer

    streams = [  # (name, speed, start, detection_stride)
        ("cam0", 1, 10, 1),
        ("cam1", 2, 4, 4),
        ("cam2", 1, 40, 4),
    ]
    clips = {name: _stream_clip(tmp_path, name, speed, start)
             for name, speed, start, _ in streams}

    with PoseScoringServer(cfg=_cfg(), batch_sizes=(1, 4, 16),
                           max_delay_ms=2.0, frame_hw=HW,
                           warm=True) as server:
        sessions = {name: StreamSession(server,
                                        detector=_ContentBoxDetector(),
                                        detection_stride=stride,
                                        ring_capacity=16)
                    for name, _, _, stride in streams}
        futures = {name: [] for name, *_ in streams}

        def feed(name):
            _, frames = clips[name]
            for frame in frames:
                futures[name].extend(sessions[name].push(frame))

        threads = [threading.Thread(target=feed, args=(name,))
                   for name, *_ in streams]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        results = {
            name: [(idx, f.result(timeout=300)) for idx, f in futs]
            for name, futs in futures.items()
        }

    for name, _, _, stride in streams:
        cfg = default_config().replace(
            MODEL={"input_shape": (64, 64)}, PARALLEL={"frames_per_step": 4},
            DETECTOR={"detection_stride": stride})
        oracle = StreamingScorer(cfg=cfg, detector=_ContentBoxDetector(),
                                 window=16, selection="online")(
            clips[name][0], INFO)
        got = results[name]
        assert [idx for idx, _ in got] == oracle.frames, name
        assert [r.reba for _, r in got] == oracle.reba_scores, name
        assert [r.rula for _, r in got] == oracle.rula_scores, name


def test_stream_session_backfill_covers_gaps():
    """A session at detection_stride 4 resolves skipped frames when the next
    detection arrives: pushes in between return empty, then the detection
    push returns the whole gap in frame order."""
    from poserisk_release_tpu.serving import StreamSession

    srv = PoseScoringServer(cfg=_cfg(), batch_sizes=(4,), frame_hw=HW,
                            warm=True, max_delay_ms=0.0)
    try:
        rng = np.random.default_rng(9)
        import cv2

        def frame(x):
            img = np.full((*HW, 3), 25, np.uint8)
            cv2.rectangle(img, (x, 10), (x + 28, 54), (190, 160, 140), -1)
            return img

        sess = StreamSession(srv, detector=_ContentBoxDetector(),
                             detection_stride=4, ring_capacity=16)
        out = sess.push(frame(8))        # detection step 0: locks + scores
        assert [i for i, _ in out] == [0]
        for j in (1, 2, 3):
            assert sess.push(frame(8 + j)) == []   # pending in the ring
        out = sess.push(frame(12))       # detection step 4: backfills 1..3
        assert [i for i, _ in out] == [1, 2, 3, 4]
        for _i, fut in out:
            assert isinstance(fut.result(timeout=120), ScoredPose)
        assert sess.target_id is not None
    finally:
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
