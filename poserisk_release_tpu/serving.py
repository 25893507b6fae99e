"""Low-latency serving runtime: request-batched pose + ergonomic scoring.

The reference is a batch CLI (`main/run.py`: one video in, result files out);
it has no online-serving story. This module is the TPU-native deployment
surface for the same per-frame capability — score individual
(frame, tracked bbox) requests arriving concurrently from many clients —
built the way TPU serving systems are:

  * **static shapes, bucketed batching**: XLA compiles one graph per batch
    bucket (e.g. 1/4/16/64); a request batch is padded up to the smallest
    bucket that fits, so NO request sequence can trigger a recompile after
    warm-up. Padding rows are edge-repeats of the last request and their
    results are dropped.
  * **deadline micro-batching**: a dispatcher thread drains the request
    queue, waiting at most ``max_delay_ms`` after the first request (or
    until the largest bucket fills) before launching — the standard
    latency/throughput dial. Per-step device latency of this exact graph
    was measured at 2.96 ms (batch 1) to 6.17 ms (batch 8) on a v5e chip
    (docs/PERF.md "serving" table), so single-digit-ms deadlines keep the
    MXU fed without visibly moving tail latency.
  * **one fused graph per request**: crop + SPIN + rotation conversions +
    SMPL joints + REBA/RULA scoring execute as a single jit step
    (throughput.make_pose_and_score_step over the shared make_pose_core),
    uint8 frames up, scores/angles down — the same single-upload contract
    as the batch Predictor's production path (pipeline.run_from_frames).

Detection/tracking are per-STREAM stateful (a SORT filter per camera), not
per-request, so they live in ``StreamSession``: one session per camera owns
its detector, SORT filter, online target lock, and detection-stride
backfill ring (the exact machinery of StreamingScorer's online mode, via
the shared streaming.OnlineTargetTracker), and feeds the tracked boxes into
THIS server's bucket ladder — so N cameras share one warm set of pose
graphs, batched across streams. Callers with their own tracker can still
submit (frame, bbox) requests directly. ``pose_stride`` must be 1: requests
are independent frames, so anchor interpolation between unrelated requests
would be meaningless.

Numerics: bucket padding edge-repeats the last request — the same padding
rule as pipeline._run_chunked — and padded rows are dropped, so a request's
result is the product path's result at that batch shape. Across DIFFERENT
bucket shapes, per-sample angles sit in the same XLA reduction-order class
as the batch pipeline across chunk sizes (~1e-4 deg; scores themselves
only move if an angle sits within that epsilon of an integer-degree rule
threshold). tests/test_serving.py pins both statements.

>>> with PoseScoringServer(frame_hw=(450, 800)) as server:
...     res = server.score(frame_u8, np.array([400., 225., 220., 220.]))
...     res.reba, res.rula, res.euler_deg.shape
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from poserisk_release_tpu.config import Config, default_config


@dataclass(frozen=True)
class ScoredPose:
    """One request's result: final scores + the angle/joint surfaces the
    reference's debug dumps expose per frame."""

    reba: int
    rula: int
    euler_deg: np.ndarray  # (24, 3) XYZ Euler, degrees
    joint_cam_mm: np.ndarray  # (24, 3) root-centered joints, mm


@dataclass(frozen=True)
class _Request:
    frame: np.ndarray
    bbox: np.ndarray
    future: Future
    t_submit: float


class PoseScoringServer:
    """Request-batching scoring server over one warm PoseEstimator.

    Parameters
    ----------
    cfg, fast, spin_int8, gender:
        Same contracts as pipeline.PoseEstimator (bf16 backbone under
        ``fast``; int8-PTQ SPIN calibrated on the first real batch under
        ``spin_int8`` — the server rebuilds its bucket graphs once, right
        after calibration).
    add_info:
        The reference's additional-information dict (load_add_info format);
        defaults to the packaged default_information.json. Fixed per server
        — per-request info would put host branching back on the hot path;
        run one server per info profile instead.
    batch_sizes:
        The bucket ladder. Compile count == len(batch_sizes) (once per
        process thanks to the persistent cache).
    max_delay_ms:
        How long the dispatcher waits after the FIRST queued request for
        more to coalesce. 0 serves strictly one-batch-per-poll.
    frame_hw:
        Fixed (height, width) of every request frame — the static-shape
        serving contract (a stray resolution would otherwise silently
        compile a new graph mid-traffic). Defaults to the reference's
        ingest cap, (450, 800) (funcs_utils.py:26-31).
    warm:
        Compile + run every bucket at construction so the first real
        request never pays a compile.
    calibration_crops:
        Representative person crops ((N, S, S, 3) float [0,1]) for the
        ``spin_int8`` activation scales, applied BEFORE warm-up so the
        warmed bucket graphs are the quantized ones. Without it the first
        REAL batch calibrates (and rebuilds/compiles the bucket graphs
        once, mid-traffic). Warm-up itself NEVER calibrates — its all-zero
        frames would silently pin degenerate scales.
    """

    def __init__(
        self,
        cfg: Config | None = None,
        add_info: Optional[Dict] = None,
        batch_sizes: Sequence[int] = (1, 4, 16, 64),
        max_delay_ms: float = 3.0,
        frame_hw: Tuple[int, int] = (450, 800),
        fast: bool = False,
        spin_int8: bool = False,
        gender: str = "neutral",
        warm: bool = True,
        calibration_crops: Optional[np.ndarray] = None,
    ):
        import jax.numpy as jnp

        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.pipeline import PoseEstimator
        from poserisk_release_tpu.throughput import default_packed_infos

        if not batch_sizes or list(batch_sizes) != sorted(set(batch_sizes)):
            raise ValueError(f"batch_sizes must be unique ascending, got {batch_sizes!r}")
        self.cfg = cfg or default_config()
        if int(self.cfg.SPIN.pose_stride) != 1:
            raise ValueError(
                "serving requires SPIN.pose_stride == 1: requests are "
                "independent frames, there are no neighbours to slerp")
        self.batch_sizes = tuple(int(b) for b in batch_sizes)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.frame_hw = (int(frame_hw[0]), int(frame_hw[1]))
        self.estimator = PoseEstimator(
            self.cfg, SMPLFamily(self.cfg.SPIN.smpl_model_dir),
            fast=fast, spin_int8=spin_int8, gender=gender)
        if self.estimator.mesh is not None:
            # Mesh quantum: the expert/pipeline shard_maps (and the data
            # sharding) need every bucket divisible by the data-axis size
            # (times stage_microbatches under pp). Buckets round UP to the
            # quantum -- request padding already edge-repeats up to the
            # bucket, so this only widens the pad, never drops requests.
            q = int(self.estimator.mesh.shape[self.estimator._data_axis])
            if self.estimator._pp:
                q *= int(self.cfg.PARALLEL.stage_microbatches)
            if q > 1:
                self.batch_sizes = tuple(sorted(
                    {((b + q - 1) // q) * q for b in self.batch_sizes}))
        if calibration_crops is not None:
            self.estimator.calibrate_spin(calibration_crops)
        if add_info is None:
            info_reba, info_rula = default_packed_infos()
        else:
            from poserisk_release_tpu.scoring import reba as reba_mod
            from poserisk_release_tpu.scoring import rula as rula_mod

            info_reba = reba_mod.pack_info(add_info)
            info_rula = rula_mod.pack_info(add_info)
        self._info_reba = jnp.asarray(info_reba)
        self._info_rula = jnp.asarray(info_rula)
        self._steps = self._build_steps()

        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._closed = threading.Event()
        self._lock = threading.Lock()
        # Bounded metric windows: a server handles unbounded request counts,
        # so percentiles/fills are over the most recent window while the
        # totals stay exact counters.
        from collections import deque

        self._latencies: "deque[float]" = deque(maxlen=4096)
        self._batch_fills: "deque[Tuple[int, int]]" = deque(maxlen=4096)
        self._n_requests = 0
        self._n_batches = 0

        if warm:
            self._warmup()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True, name="poserisk-serving")
        self._thread.start()

    # -- graph construction -------------------------------------------------
    def _build_steps(self) -> Dict[int, object]:
        """One jitted fused step per bucket, bound to the estimator's
        CURRENT pose core (rebuilt after int8 calibration swaps the core)."""
        import jax

        from poserisk_release_tpu.ops.crop import crop_batch
        from poserisk_release_tpu.scoring.reba import reba_frame_scores
        from poserisk_release_tpu.scoring.rula import rula_frame_scores

        core = self.estimator._pose_core
        scale = float(self.cfg.DATASET.bbox_scale)
        out_size = int(self.cfg.MODEL.input_shape[0])

        def step(variables, smpl_params, frames_u8, bboxes, info_reba, info_rula):
            crops = crop_batch(frames_u8, bboxes, scale=scale, out_size=out_size)
            euler, joint_cam, _aa = core(variables, smpl_params, crops)
            reba = reba_frame_scores(euler, info_reba)["score"]
            rula = rula_frame_scores(euler, info_rula)["score"]
            return reba, rula, euler, joint_cam

        # One jit per bucket: jax.jit caches by (fn, shapes); distinct
        # wrappers keep the cache entries alive across core rebuilds' GC.
        return {b: jax.jit(step) for b in self.batch_sizes}

    def _warmup(self) -> None:
        frames = np.zeros((1, *self.frame_hw, 3), np.uint8)
        boxes = np.asarray(
            [[self.frame_hw[1] / 2, self.frame_hw[0] / 2, 32.0, 32.0]],
            np.float32)
        for b in self.batch_sizes:
            # allow_calibration=False: warm-up frames are zeros, and int8
            # scales pinned on black frames would be degenerate.
            self._run_bucket(np.repeat(frames, b, 0), np.repeat(boxes, b, 0),
                             allow_calibration=False)

    def _run_bucket(self, frames: np.ndarray, bboxes: np.ndarray,
                    allow_calibration: bool = True):
        import jax

        mesh = self.estimator.mesh
        if mesh is not None:
            # Multi-chip serving: the bucket batch shards over the DATA
            # axis of the estimator's config-built mesh (per-sample math is
            # untouched, so results equal the single-device server's --
            # test_serving_data_parallel_buckets). Buckets not divisible by
            # the data-axis size stay replicated (correct, just unsharded);
            # size the ladder in data-axis multiples to avoid that.
            from poserisk_release_tpu.parallel import mesh as pmesh

            n_data = int(mesh.shape[self.estimator._data_axis])
            if frames.shape[0] % n_data == 0:
                frames = pmesh.shard_batch(mesh, np.asarray(frames),
                                           self.estimator._data_axis)
                bboxes = pmesh.shard_batch(mesh, np.asarray(bboxes),
                                           self.estimator._data_axis)
        if allow_calibration and self.estimator.spin_needs_calibration:
            # Same implicit first-batch lifecycle as run_from_frames; the
            # quantized core replaces the f32 one, so the bucket graphs are
            # rebuilt around it exactly once.
            from poserisk_release_tpu.ops.crop import crop_batch

            self.estimator._ensure_spin_quantized(crop_batch(
                frames[:8], bboxes[:8],
                scale=float(self.cfg.DATASET.bbox_scale),
                out_size=int(self.cfg.MODEL.input_shape[0])))
            self._steps = self._build_steps()
        reba, rula, euler, joint_cam = self._steps[frames.shape[0]](
            self.estimator.variables, self.estimator.smpl_params,
            frames, bboxes, self._info_reba, self._info_rula)
        return jax.device_get((reba, rula, euler, joint_cam))

    # -- request path --------------------------------------------------------
    def submit(self, frame: np.ndarray, bbox: np.ndarray) -> "Future[ScoredPose]":
        """Enqueue one request; returns a Future resolving to ScoredPose.

        frame: (H, W, 3) uint8 RGB matching frame_hw. bbox: (4,) squared
        cxcywh in frame pixels (tracking.mpt.squared_cxcywh convention —
        what SORT/MPT hand the crop stage).

        submit() OWNS its inputs from the moment it returns: the frame and
        bbox are copied at enqueue, so a caller may immediately reuse its
        capture buffer (the dispatcher batches asynchronously — without the
        copy, a reused buffer's NEWER pixels would race into an older
        request's batch)."""
        if self._closed.is_set():
            raise RuntimeError("server is closed")
        frame = np.asarray(frame)
        if frame.shape != (*self.frame_hw, 3):
            raise ValueError(
                f"frame shape {frame.shape} != serving contract "
                f"{(*self.frame_hw, 3)}; fix the ingest or start the server "
                f"with frame_hw={frame.shape[:2]}")
        if frame.dtype != np.uint8:
            raise ValueError(f"frame dtype {frame.dtype} != uint8")
        frame = np.array(frame, copy=True)
        bbox = np.array(np.asarray(bbox, np.float32).reshape(4), copy=True)
        fut: Future = Future()
        self._queue.put(_Request(frame, bbox, fut, time.perf_counter()))
        if self._closed.is_set() and not fut.done():
            # close() can win the race between the entry check above and the
            # put: its drain pass has already run, so nothing will ever pull
            # this request off the queue. Never leave an unresolvable future
            # (a score() caller with no timeout would block forever).
            try:
                fut.set_exception(RuntimeError("server is closed"))
            except InvalidStateError:
                pass  # the dispatcher's final batch resolved it concurrently
        return fut

    def score(self, frame: np.ndarray, bbox: np.ndarray,
              timeout: Optional[float] = None) -> ScoredPose:
        """Blocking submit()."""
        return self.submit(frame, bbox).result(timeout)

    # -- dispatcher -----------------------------------------------------------
    def _collect_batch(self) -> List[_Request]:
        """Block for the first request, then coalesce until the deadline or
        the largest bucket fills."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        cap = self.batch_sizes[-1]
        deadline = time.perf_counter() + self.max_delay_s
        while len(batch) < cap:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _dispatch_loop(self) -> None:
        while not self._closed.is_set():
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                n = len(batch)
                bucket = next(b for b in self.batch_sizes if b >= n)
                frames = np.stack([r.frame for r in batch]
                                  + [batch[-1].frame] * (bucket - n))
                boxes = np.stack([r.bbox for r in batch]
                                 + [batch[-1].bbox] * (bucket - n))
                reba, rula, euler, joint_cam = self._run_bucket(frames, boxes)
                now = time.perf_counter()
                with self._lock:
                    self._n_requests += n
                    self._n_batches += 1
                    self._batch_fills.append((n, bucket))
                    self._latencies.extend(now - r.t_submit for r in batch)
                for i, r in enumerate(batch):
                    # submit() may have already failed this future if close()
                    # raced its queue put; an unguarded set_result would raise
                    # InvalidStateError and the handler below would poison the
                    # REST of the batch's successfully computed results.
                    if not r.future.done():
                        r.future.set_result(ScoredPose(
                            int(reba[i]), int(rula[i]),
                            np.asarray(euler[i]), np.asarray(joint_cam[i])))
            except StopIteration:
                err = RuntimeError(
                    f"batch of {len(batch)} exceeds the largest bucket "
                    f"{self.batch_sizes[-1]}")  # unreachable: capped above
                for r in batch:
                    r.future.set_exception(err)
            except Exception as exc:  # surface device/jit failures per request
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(exc)

    # -- lifecycle / metrics ---------------------------------------------------
    def stats(self) -> Dict:
        """Serving counters: exact request/batch totals, plus per-batch
        (n_real, bucket) fills and submit->result latency percentiles
        (seconds) over the most recent 4096-entry window."""
        with self._lock:
            lats = np.asarray(self._latencies)
            fills = list(self._batch_fills)
        out: Dict = {
            "requests": int(self._n_requests),
            "batches": int(self._n_batches),
            "queue_depth": self._queue.qsize(),
            "batch_fill": fills,
        }
        if len(lats):
            out.update(
                latency_p50=float(np.percentile(lats, 50)),
                latency_p95=float(np.percentile(lats, 95)),
                latency_p99=float(np.percentile(lats, 99)),
            )
        return out

    def close(self, timeout: float = 10.0) -> None:
        """Stop the dispatcher; pending futures fail with RuntimeError."""
        if self._closed.is_set():
            return
        self._closed.set()
        self._thread.join(timeout)
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if not r.future.done():
                r.future.set_exception(RuntimeError("server closed"))

    def __enter__(self) -> "PoseScoringServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class StreamSession:
    """Per-camera online session over a shared PoseScoringServer.

    Owns the per-STREAM state the request-batched server deliberately does
    not: a detector instance (so int8 activation scales can be per-camera),
    a SORT filter, the largest-box target lock, and the detection-stride
    backfill ring — the EXACT policy of StreamingScorer's online mode
    (streaming.OnlineTargetTracker is the one shared implementation), so a
    session's (frame, box) sequence equals the online scorer's on the same
    feed. Pose + REBA/RULA ride the server's bucket ladder, batched ACROSS
    all sessions sharing it.

    >>> with PoseScoringServer(frame_hw=(450, 800)) as server:
    ...     cams = [StreamSession(server) for _ in range(4)]
    ...     for idx, fut in cams[0].push(frame_u8):
    ...         results[idx] = fut.result()

    Parameters
    ----------
    server:
        The shared PoseScoringServer (frames must match its frame_hw).
    detector:
        Person detector for THIS stream; defaults to the Predictor's
        detector policy (pipeline.build_detector on server.cfg: YOLOv3 when
        weights exist, else the full-frame stub). An int8 detector
        calibrates implicitly on this stream's first detected frame —
        prefer an explicit ``calibrate(frames)`` with representative frames
        (a dark opening frame pins the scales either way).
    detection_stride:
        Detect every Nth pushed frame (defaults to the server config's
        DETECTOR.detection_stride); skipped frames backfill through the
        pending ring exactly like the online streaming mode.
    ring_capacity:
        Pending-ring bound in frames (the online mode's window): gaps that
        outgrow it flush oldest-first with the last detection's box held.
    """

    def __init__(self, server: PoseScoringServer, detector=None,
                 detection_stride: Optional[int] = None,
                 ring_capacity: int = 256):
        from poserisk_release_tpu.pipeline import build_detector
        from poserisk_release_tpu.streaming import OnlineTargetTracker

        self.server = server
        self.detector = (detector if detector is not None
                         else build_detector(server.cfg))
        self.stride = int(server.cfg.DETECTOR.detection_stride
                          if detection_stride is None else detection_stride)
        if self.stride < 1:
            raise ValueError(f"detection_stride must be >= 1, got {self.stride}")
        # copy_pending: a pushed frame may be the caller's reused capture
        # buffer; frames waiting in the backfill ring must not alias it.
        self._tracker = OnlineTargetTracker(
            ring_capacity=int(ring_capacity), backfill=self.stride > 1,
            copy_pending=True)
        self._next_idx = 0

    def calibrate(self, frames: np.ndarray) -> None:
        """Explicit int8 detector calibration on representative frames for
        this camera. No-op for detectors without calibration state."""
        if getattr(self.detector, "needs_calibration", False):
            self.detector.calibrate(np.asarray(frames))

    @property
    def target_id(self) -> Optional[int]:
        """The currently followed SORT identity (None before lock-on)."""
        return self._tracker.target_id

    def push(self, frame: np.ndarray) -> List[Tuple[int, "Future[ScoredPose]"]]:
        """Feed the stream's next frame (H, W, 3 uint8, server frame_hw).

        Returns [(frame_idx, future)] for every frame that became scoreable
        — possibly empty (no target yet / waiting in the backfill ring),
        possibly covering EARLIER frames (a detection resolves the pending
        gap's interpolated boxes), in frame order. Frame indices count
        pushes from 0."""
        from poserisk_release_tpu.tracking.mpt import detect_frames

        frame = np.asarray(frame)
        idx = self._next_idx
        self._next_idx += 1
        dets = None
        if idx % self.stride == 0:
            if getattr(self.detector, "needs_calibration", False):
                # Implicit per-stream lifecycle: first detected frame pins
                # this camera's scales (see calibrate()).
                self.detector.calibrate(frame[None])
            dets = detect_frames(self.detector, frame[None])[0]
        return [
            (gidx, self.server.submit(rgb, np.asarray(box, np.float32)))
            for gidx, rgb, box in self._tracker.observe(idx, frame, dets)
        ]
