"""Bounded-memory streaming scorer for long videos.

The reference (and this package's Predictor) materialises every frame of the
clip before scoring -- fine for demo videos, unbounded for hours-long footage.
This module scores a video in fixed-size windows with a one-window lookahead
decoded on a background host thread, so video decode overlaps device compute
and peak host memory is ~2 windows of frames (O(decode_workers * window)
when DATASET.decode_workers > 1 -- io.video.iter_windows_parallel).

Two target-selection modes:

  * ``selection="reference"`` (default) -- TWO passes, both bounded-memory:
    pass 1 decodes + detects + SORT-tracks the whole video, accumulating only
    per-identity bbox/frame lists (O(tracked frames), no pixels retained);
    then the reference's filter + max-mean-area selection runs over the
    complete tracks (/root/reference/lib/core/base.py:53-74,
    funcs_utils.py:55-64) exactly as the whole-clip Predictor does; pass 2
    re-decodes and crops/scores only the selected person. Scores are
    IDENTICAL to the batch Predictor on any clip, including multi-person
    contention and pose_stride > 1 (tests/test_streaming.py): under a pose
    stride the track accumulates into the batch path's own chunk structure
    (_TrackChunkScorer), so the slerp anchor phase is keyed to the selected
    track's frame index, not the window.
  * ``selection="online"`` -- single pass, lowest latency: lock onto the
    largest-box identity as soon as one is seen and follow it. No min-frame
    filter and no whole-video mean-area comparison, so on multi-person clips
    it can score a different person than the reference semantics; use it for
    live feeds where a second decode pass is impossible. Under
    detection_stride > 1 skipped frames wait in a bounded ring (one window
    of pixels) and are scored with boxes interpolated between the
    surrounding detections -- the same gap rule as the two-pass/batch modes
    (tracking.mpt.interpolate_track_gaps) -- so EVERY frame between the
    target's first and last detection is scored; gaps that outgrow the ring
    and identity switches degrade only the box rule (last detection's box
    held instead of interpolated; see _run_online), never the coverage.

Pipeline per window: decode -> [detect+track] -> crop -> fused pose+score
step -> accumulate per-frame scores/stats. The final aggregation matches
outputs.stats.post_process_scores semantics over the whole video.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from poserisk_release_tpu.config import Config, default_config


@dataclass
class StreamResult:
    frames: List[int] = field(default_factory=list)
    reba_scores: List[int] = field(default_factory=list)
    rula_scores: List[int] = field(default_factory=list)
    # Per-frame per-joint log entries (the scorers' "log_score"), in the
    # same frame order -- what the annotated video's side panel prints.
    reba_logs: List[list] = field(default_factory=list)
    rula_logs: List[list] = field(default_factory=list)
    total_frames: int = 0
    fps: float = 0.0

    def stats(self, which: str = "reba"):
        """(avg, top50, top10, max, mode) via the ONE shared implementation
        (outputs.stats.final_scores_stats -- the same code the Predictor and
        write_outputs use, so the reference's stat semantics cannot fork).
        Raises ValueError with a clear message when the stream scored zero
        frames (e.g. the online mode never saw a detection)."""
        from poserisk_release_tpu.outputs.stats import final_scores_stats

        return final_scores_stats(getattr(self, f"{which}_scores"))


def _decode_windows(path: str, window: int, out_q: "queue.Queue",
                    max_frames: Optional[int], stop: "threading.Event"):
    """Background thread: decode + resize-rule, emit (start_idx, frames)
    windows. The pixel pipeline and bounded put are the SHARED io.video
    helpers (io.video._decoded_rgb / _bounded_put) so the streamed frames
    cannot fork from read_video's and an abandoned consumer (exception
    mid-scoring) releases the thread, the VideoCapture handle and the
    buffered windows instead of blocking forever on the full queue."""
    from poserisk_release_tpu.io.video import (
        _bounded_put,
        _decoded_rgb,
        _open_video,
    )

    def emit(item) -> bool:
        return _bounded_put(out_q, item, stop)

    try:
        cap, fps, width, height = _open_video(path)
    except FileNotFoundError:
        emit(("error", "not_found", f"cannot open video: {path}"))
        return
    except Exception as exc:
        # Any OTHER setup failure (cv2 import error on a headless host, a
        # raising backend constructor, ...) must also surface as an item:
        # a thread that dies before emitting anything leaves the consumer
        # blocked forever on q.get().
        emit(("error", "setup", f"decode setup failed for {path}: {exc!r}"))
        return
    if not emit(("meta", fps)):
        cap.release()
        return

    buf: List[np.ndarray] = []
    idx = 0
    try:
        for idx_, rgb in _decoded_rgb(cap, width, height,
                                      max_frames=max_frames):
            if stop.is_set():
                return
            buf.append(rgb)
            idx = idx_ + 1
            if len(buf) == window:
                if not emit(("window", idx - window, np.stack(buf))):
                    return
                buf = []
        if buf:
            emit(("window", idx - len(buf), np.stack(buf)))
    except Exception as exc:
        # A mid-clip decode failure (corrupt frame in cv2, MemoryError on
        # np.stack, ...) must NOT masquerade as clean EOF: emitting
        # ("end", idx) here would make the consumer score a silent prefix of
        # the video with an inflated total_frames (and a wrong min-frame-
        # ratio filter). Surface it as an error item instead; the buffered
        # frames that never formed a window are intentionally dropped.
        emit(("error", "decode", f"decode failed after frame {idx}: {exc!r}"))
        return
    finally:
        cap.release()
    emit(("end", idx))


def _window_stream(video_path: str, window: int, max_frames: Optional[int],
                   workers: int = 1):
    """Generator over decoded windows with a one-window-lookahead thread.

    Yields ("meta", fps) | ("window", start_idx, frames) | ("end", total).

    workers > 1 decodes with that many capture threads over window-aligned
    segments (io.video.iter_windows_parallel) -- same protocol, serial-exact
    frames (integrity-guarded seek with automatic serial fallback), peak
    buffered memory O(workers * window) frames instead of 2 windows."""
    if workers > 1:
        from poserisk_release_tpu.io.video import iter_windows_parallel

        yield from iter_windows_parallel(video_path, window, workers,
                                         max_frames)
        return
    q: "queue.Queue" = queue.Queue(maxsize=2)  # 1 window in flight + 1 ready
    stop = threading.Event()
    thread = threading.Thread(
        target=_decode_windows, args=(video_path, window, q, max_frames, stop),
        daemon=True,
    )
    thread.start()
    try:
        while True:
            item = q.get()
            if item[0] == "error":
                # Structured ("error", kind, msg) items: the exception type
                # is picked by the kind tag, not by matching message text,
                # so rewording a message cannot silently change the type.
                _, kind, msg = item
                if kind == "not_found":
                    raise FileNotFoundError(msg)
                raise RuntimeError(msg)  # setup / mid-clip decode failure
            yield item
            if item[0] == "end":
                break
    finally:
        stop.set()
        thread.join(timeout=5)


class OnlineTargetTracker:
    """Single-pass target-follow + detection-stride backfill state machine.

    THE one implementation of the online selection policy (largest-box
    lock-on, re-lock on identity loss) and the bounded-ring gap rules --
    shared by StreamingScorer's online mode and serving.StreamSession so
    their box sequences cannot fork. Feed every frame in order through
    ``observe``; it returns the frames that became scoreable, each with its
    f64 cxcywh box:

      * a frame whose detections contain the followed target returns
        itself, plus any pending gap frames -- boxes linearly interpolated
        between the surrounding detections (interpolate_track_gaps rule),
        or HELD at the old identity's last box when the target identity
        switched (never a blend of two people);
      * a frame without detections (a stride-skipped frame, or a detection
        step that missed the target) waits in the bounded pending ring;
        when the ring outgrows ``ring_capacity`` the oldest frame flushes
        with the last detection's box held (anchor-hold);
      * frames before the first detection are never scored (the
        no-extrapolation rule); frames after the last one stay pending.

    ``backfill=False`` (the detection-stride-1 contract) disables the
    pending ring entirely: only directly tracked frames score, exactly like
    the two-pass mode at stride 1.

    ``copy_pending=True`` copies each frame as it enters the pending ring:
    required when the caller may reuse its frame buffer between calls
    (serving.StreamSession's per-push API). The streaming scorer keeps the
    zero-copy default -- its pending entries are views into immutable
    decode windows, consecutive by construction, so at most ~2 window
    buffers stay referenced.
    """

    def __init__(self, ring_capacity: int, backfill: bool = True,
                 copy_pending: bool = False):
        from poserisk_release_tpu.tracking.sort import Sort

        self.sort = Sort()
        self.ring = int(ring_capacity)
        self.backfill = backfill
        self.copy_pending = copy_pending
        self.target_id: Optional[int] = None
        self.pending: List[Tuple[int, np.ndarray]] = []
        self.last_det: Optional[Tuple[int, np.ndarray]] = None

    def _follow(self, tracks: np.ndarray):
        """Largest-box lock-on; returns (row, switched)."""
        if tracks.shape[0] == 0:
            return None, False
        switched = False
        if self.target_id is None or not np.any(tracks[:, 4] == self.target_id):
            areas = (tracks[:, 2] - tracks[:, 0]) * (tracks[:, 3] - tracks[:, 1])
            new_id = int(tracks[int(np.argmax(areas)), 4])
            switched = self.target_id is not None
            self.target_id = new_id
        return tracks[tracks[:, 4] == self.target_id][0], switched

    def observe(self, gidx: int, frame: np.ndarray,
                dets: Optional[np.ndarray]
                ) -> List[Tuple[int, np.ndarray, np.ndarray]]:
        """Advance by one frame. dets: this frame's (N, 5) detections, or
        None for a stride-skipped frame. Returns [(global_idx, rgb, box)]
        newly scoreable, in frame order."""
        from poserisk_release_tpu.tracking.mpt import squared_cxcywh

        out: List[Tuple[int, np.ndarray, np.ndarray]] = []
        if dets is not None:
            tracks = self.sort.update(
                np.asarray(dets, np.float64).reshape(-1, 5))
            row, switched = self._follow(tracks)
            if row is not None:
                box = squared_cxcywh(row[0], row[1], row[2], row[3])
                if self.last_det is not None and self.pending:
                    g0, b0 = self.last_det
                    for pg, prgb in self.pending:
                        if switched:
                            # The pending gap belongs to the OLD identity's
                            # era: its last box held, never a blend.
                            out.append((pg, prgb, b0.copy()))
                        else:
                            t = (pg - g0) / (gidx - g0)
                            out.append((pg, prgb, b0 + (box - b0) * t))
                self.pending.clear()
                out.append((gidx, frame, box))
                self.last_det = (gidx, box)
                return out
        if not self.backfill:
            return out
        self.pending.append(
            (gidx, np.array(frame, copy=True) if self.copy_pending else frame))
        if len(self.pending) > self.ring:
            # Ring overflow: flush the oldest frame with the last
            # detection's box held instead of dropping its pixels.
            pg, prgb = self.pending.pop(0)
            if self.last_det is not None:
                out.append((pg, prgb, self.last_det[1].copy()))
        return out


class _SpinCalibrator:
    """Shared int8-PTQ calibration source for chunk-aligned streaming.

    The batch path calibrates the SPIN backbone on the first (up to) 8
    frames of the FIRST scored track (run_from_frames crops
    frame_ids[:8]); in --multi_person that is the first surviving track
    in discovery order. Chunk-aligned streaming flushes tracks in
    chunk-fill order, which for multiple tracks can differ from that --
    so the calibration pixels are gathered HERE, from the designated
    owner track in window order, and every accumulator's flush routes
    through ensure() before touching the estimator. Pixels are copied
    (a view would pin its whole decode window)."""

    def __init__(self, est):
        self.est = est
        self._px: List[np.ndarray] = []
        self._boxes: List[np.ndarray] = []

    @property
    def gathering(self) -> bool:
        return (self.est._spin_int8 and self.est._quant_backbone is None
                and len(self._px) < 8)

    def gather(self, frames, local_ids, boxes) -> None:
        for i, box in zip(np.asarray(local_ids), np.asarray(boxes)):
            if len(self._px) >= 8:
                return
            self._px.append(np.array(frames[i], copy=True))
            self._boxes.append(np.asarray(box))

    def ensure(self) -> None:
        if (not self.est._spin_int8 or self.est._quant_backbone is not None
                or not self._px):
            return
        import jax.numpy as jnp

        from poserisk_release_tpu.ops.crop import crop_batch

        calib = crop_batch(
            jnp.asarray(np.stack(self._px)),
            jnp.asarray(np.stack(self._boxes).astype(np.float32)),
            scale=float(self.est.cfg.DATASET.bbox_scale),
            out_size=int(self.est.cfg.MODEL.input_shape[0]))
        self.est._ensure_spin_quantized(calib)
        self._px, self._boxes = [], []


class _TrackChunkScorer:
    """Accumulates ONE selected track across decode windows and scores it
    in EXACTLY the batch Predictor's chunk structure.

    At pose_stride > 1 the batch path slices SPIN anchors per
    production_chunk()-sized chunk of the selected track
    (pipeline.PoseEstimator._run_chunked), so anchor phase and chunk
    boundaries are a function of the track's own frame index. Scoring
    window-by-window restarts that phase at every window (the former
    PARITY #5b streaming qualifier); instead this helper buffers the
    anchor frames (1/stride of the pixels, O(chunk) memory -- each anchor
    is COPIED out of its decode window, since holding views would pin
    every window the chunk spans) until a full chunk of track frames has
    streamed past, then replays the batch call: run_from_frames on a
    virtual track whose ids repeat each anchor stride times -- the
    strided slicing inside _run_chunked then selects exactly the buffered
    anchors, with the batch path's padding and trimming. Scores are
    bit-identical to the whole-clip Predictor (tests/test_streaming.py::
    test_two_pass_pose_stride_bit_exact_vs_batch).
    """

    def __init__(self, scorer: "StreamingScorer", add_info: Dict,
                 reba, rula, result: StreamResult,
                 calibrator: _SpinCalibrator):
        self.est = scorer.estimator
        self.validate = scorer.validate_rotations
        self.stride = self.est._pose_stride
        self.chunk = self.est.production_chunk()
        self.add_info, self.reba, self.rula = add_info, reba, rula
        self.result = result
        self.calibrator = calibrator
        self._pos = 0  # track position within the current chunk
        self._anchor_px: List[np.ndarray] = []
        self._anchor_boxes: List[np.ndarray] = []
        self._ids: List[int] = []

    def add(self, frames, local_ids: np.ndarray, boxes: np.ndarray,
            start_idx: int) -> None:
        for i, box in zip(np.asarray(local_ids), np.asarray(boxes)):
            if self._pos % self.stride == 0:
                self._anchor_px.append(np.array(frames[i], copy=True))
                self._anchor_boxes.append(box)
            self._ids.append(int(start_idx + i))
            self._pos += 1
            if self._pos == self.chunk:
                self.flush()

    def flush(self) -> None:
        if self._pos == 0:
            return
        self.calibrator.ensure()
        n = self._pos
        # Virtual track: id j//stride at position j, so the strided slice
        # inside _run_chunked reads the buffered anchors 0..n_anchors-1 in
        # order; boxes repeat so the same slice reads the anchors' boxes.
        ids = np.repeat(np.arange(len(self._anchor_px)), self.stride)[:n]
        boxes = np.repeat(np.stack(self._anchor_boxes), self.stride,
                          axis=0)[:n]
        euler, joint_cam, aa = self.est.run_from_frames(
            np.stack(self._anchor_px), ids, boxes, chunk=self.chunk)
        if self.validate:
            from poserisk_release_tpu.pipeline import (
                validate_rotation_roundtrip,
            )

            validate_rotation_roundtrip(aa)
        for r in self.reba(euler, joint_cam, self.add_info):
            self.result.reba_scores.append(r["score"])
            self.result.reba_logs.append(r["log_score"])
        for r in self.rula(euler, joint_cam, self.add_info):
            self.result.rula_scores.append(r["score"])
            self.result.rula_logs.append(r["log_score"])
        self.result.frames.extend(self._ids)
        self._pos = 0
        self._anchor_px, self._anchor_boxes, self._ids = [], [], []


class StreamingScorer:
    """Window-at-a-time scoring with persistent tracking state.

    >>> scorer = StreamingScorer(detector=StubDetector())
    >>> result = scorer(video_path, add_info)
    """

    def __init__(
        self,
        cfg: Config | None = None,
        detector=None,
        window: int = 256,
        mesh=None,
        spin_variables=None,
        selection: str = "reference",
        fast: bool = False,
        spin_int8: bool = False,
        gender: str = "neutral",
        validate_rotations: bool = False,
    ):
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import PoseEstimator

        if selection not in ("reference", "online"):
            raise ValueError(f"selection must be 'reference' or 'online', got {selection!r}")
        self.cfg = cfg or default_config()
        self.window = window
        self.selection = selection
        self.smpl = SMPLFamily(self.cfg.SPIN.smpl_model_dir)
        # fast=True: same contract as Predictor's --fast (bf16 SPIN backbone,
        # and on real TPU hardware the Pallas crop inside the fused
        # crop+pose jit).
        self.estimator = PoseEstimator(self.cfg, self.smpl, mesh=mesh,
                                       variables=spin_variables, fast=fast,
                                       spin_int8=spin_int8, gender=gender)
        self.detector = detector if detector is not None else StubDetector()
        # Same opt-in euler round-trip guard as Predictor(--validate_rotations),
        # via the ONE shared check (pipeline.validate_rotation_roundtrip).
        self.validate_rotations = validate_rotations

    def _per_video_calibration_reset(self) -> None:
        """Same shared-instance int8 lifecycle as Predictor.__call__: under
        recalibrate_per_video each video re-derives its own scales instead
        of inheriting the previous clip's exposure statistics. Skipped when
        an explicit calibration source is set -- those scales are a pure
        function of the static source, so resetting would only waste a
        float-tower pass re-deriving identical values."""
        if (self.cfg.DETECTOR.recalibrate_per_video
                and not self.cfg.DETECTOR.calibration):
            if hasattr(self.detector, "reset_calibration"):
                self.detector.reset_calibration()
            self.estimator.reset_calibration()

    def __call__(self, video_path: str, add_info: Dict,
                 max_frames: Optional[int] = None,
                 video_output: Optional[str] = None,
                 video_types: str = "REBA,RULA") -> StreamResult:
        """video_output: directory to write the annotated {REBA,RULA}_video
        .mp4 into, rendered INCREMENTALLY during pass 2 (frame-exact vs the
        batch renderer -- outputs.render.ResultVideoWriter). Still bounded
        memory: one window of pixels at a time; rendering decodes the whole
        clip (the stop-after-last-selected-frame shortcut would truncate
        the video). Two-pass mode only: the online mode has no complete
        track for the side panel's snapped reads."""
        self._per_video_calibration_reset()
        if self.selection == "reference":
            return self._run_two_pass(video_path, add_info, max_frames,
                                      video_output, video_types)
        if video_output is not None:
            raise ValueError(
                "video rendering requires the two-pass mode "
                "(selection='reference')")
        return self._run_online(video_path, add_info, max_frames)

    def score_all(self, video_path: str, add_info: Dict,
                  max_frames: Optional[int] = None,
                  video_output: Optional[str] = None,
                  video_types: str = "REBA,RULA") -> Dict[int, StreamResult]:
        """Multi-person streaming: score EVERY track surviving the
        reference's min-frames filter, bounded-memory.

        The batch Predictor's --multi_person extension (pipeline.py) for
        long footage: pass 1 tracks everyone (O(tracked frames), no pixels
        retained); pass 2 re-decodes ONCE and scores all surviving tracks
        from the shared windows -- per-track filter/fallback semantics match
        the batch path exactly (min(min_frame_ratio * total, 1000), keep-all
        fallback, base.py:66-68). Returns {person_id: StreamResult}; write
        each with write_outputs into its own directory.

        video_output: base output directory -- each surviving track's
        annotated {REBA,RULA}_video.mp4 is rendered incrementally into
        <video_output>/person_<id>/ (the batch --multi_person layout),
        still one window of pixels at a time; decodes the whole clip like
        the single-target renderer."""
        if self.selection != "reference":
            raise ValueError(
                "score_all needs the two-pass mode (selection='reference'): "
                "online selection locks onto a single identity by design")
        self._per_video_calibration_reset()
        tracking_results, total, fps = self._track_pass(video_path, max_frames)
        if not tracking_results:
            return {}
        from poserisk_release_tpu.tracking.mpt import surviving_tracks

        survivors = surviving_tracks(
            tracking_results, total, self.cfg.DATASET.min_frame_ratio)
        # Keep the tracker's native float64 boxes: the renderer's int()
        # truncation is dtype-sensitive (f32 rounds 72.99999676 up to 73.0,
        # f64 truncates to 72 -- a one-pixel box shift vs the batch
        # renderer). Scoring is unaffected either way (_score_window casts
        # to float32 itself, exactly like the batch crop path).
        tracks = {
            pid: (np.asarray(t["frames"]), np.asarray(t["bbox"]))
            for pid, t in survivors.items()
        }
        results = {pid: StreamResult(total_frames=total, fps=fps)
                   for pid in tracks}
        reba, rula = self._scorers()
        stop_at = max(int(fr.max()) for fr, _ in tracks.values()) + 1
        if max_frames is not None:
            stop_at = min(stop_at, max_frames)
        render_plan, video_output = self._build_render_plan(
            reba, rula, video_types, video_output)
        if self.estimator._pose_stride > 1:
            # Chunk-aligned scoring per track (batch-identical anchor
            # phase; see _TrackChunkScorer). Each track buffers its own
            # anchor pixels, so the shared union upload below doesn't
            # apply -- at stride S only 1/S of each track's frames is
            # uploaded at all. Rendering runs as its own decode pass from
            # the complete results (stop_at here is still the scoring
            # stop: the last selected frame).
            # int8 calibration pixels come from the FIRST surviving track
            # in discovery order -- the track whose first run_from_frames
            # call calibrates the batch --multi_person path -- regardless
            # of which track's chunk happens to fill (and flush) first.
            cal = _SpinCalibrator(self.estimator)
            owner = next(iter(tracks))
            accs = {pid: _TrackChunkScorer(self, add_info, reba, rula,
                                           results[pid], cal)
                    for pid in tracks}
            for item in _window_stream(video_path, self.window, stop_at,
                                       self.cfg.DATASET.decode_workers):
                if item[0] != "window":
                    continue
                _, start_idx, frames = item
                for pid, (fr, bx) in tracks.items():
                    mask = (fr >= start_idx) & (fr < start_idx + len(frames))
                    if mask.any():
                        ids = fr[mask] - start_idx
                        if pid == owner and cal.gathering:
                            cal.gather(frames, ids, bx[mask])
                        accs[pid].add(frames, ids, bx[mask],
                                      int(start_idx))
            for acc in accs.values():
                acc.flush()
            if video_output is not None:
                import os

                entries = []
                for pid, (fr, bx) in tracks.items():
                    person_out = os.path.join(video_output, f"person_{pid}")
                    os.makedirs(person_out, exist_ok=True)
                    entries.append((results[pid], fr, bx, person_out))
                self._render_pass(video_path, max_frames, video_output,
                                  render_plan, fps, entries)
            return results

        writers: Dict[int, list] = {}
        if video_output is not None:
            stop_at = max_frames  # rendering draws the whole clip
        try:
            for item in _window_stream(video_path, self.window, stop_at,
                                       self.cfg.DATASET.decode_workers):
                if item[0] != "window":
                    continue
                _, start_idx, frames = item
                if video_output is not None and not writers:
                    import os

                    from poserisk_release_tpu.outputs.render import (
                        ResultVideoWriter,
                    )

                    for pid, (fr, bx) in tracks.items():
                        person_out = os.path.join(video_output,
                                                  f"person_{pid}")
                        os.makedirs(person_out, exist_ok=True)
                        writers[pid] = [
                            ResultVideoWriter(person_out, title, fps,
                                              frames.shape[1:3],
                                              scorer.eval_items, fr, bx)
                            for title, scorer, _, _ in render_plan
                        ]
                overlapping = []
                for pid, (fr, bx) in tracks.items():
                    mask = (fr >= start_idx) & (fr < start_idx + len(frames))
                    if mask.any():
                        overlapping.append(
                            (pid, fr[mask] - start_idx, bx[mask]))
                if len(overlapping) > 1:
                    # Multi-person windows share ONE device upload of the
                    # union of selected frames; each track then gathers its
                    # own frames on device (run_from_frames / _run_chunked
                    # handle jax.Array sources natively). Without this,
                    # every frame seen by P tracks shipped to the device P
                    # times per window. Scores are bit-identical: each track
                    # still feeds the exact same (frame, bbox) sequence
                    # through the same chunking/stride.
                    import jax.numpy as jnp

                    union = np.unique(np.concatenate(
                        [ids for _, ids, _ in overlapping]))
                    pos = np.full(int(union.max()) + 1, -1, np.int64)
                    pos[union] = np.arange(len(union))
                    frames_src = jnp.asarray(frames[union])
                    for pid, ids, bx in overlapping:
                        self._score_window(
                            frames_src, pos[ids], bx,
                            int(start_idx), add_info, reba, rula,
                            results[pid], orig_local_ids=ids,
                        )
                elif overlapping:
                    pid, ids, bx = overlapping[0]
                    self._score_window(
                        frames, ids, bx,
                        int(start_idx), add_info, reba, rula, results[pid],
                    )
                for pid, per_title in writers.items():
                    for writer, (_, _, s_attr, l_attr) in zip(per_title,
                                                              render_plan):
                        writer.write_window(frames, int(start_idx),
                                            getattr(results[pid], s_attr),
                                            getattr(results[pid], l_attr))
        finally:
            # close() on every path: an exception mid-clip (decode failure,
            # scoring error, rotation-validation assert) must not leak cv2
            # VideoWriter handles / leave unreleased mp4s behind.
            for per_title in writers.values():
                for writer in per_title:
                    writer.close()
        return results

    # -- pass 1: detect + track only (no pixels retained) -----------------
    def _track_pass(self, video_path: str, max_frames: Optional[int]
                    ) -> Tuple[Dict[int, Dict[str, np.ndarray]], int, float]:
        from poserisk_release_tpu.tracking.mpt import (
            finalize_tracks,
            interpolate_track_gaps,
            update_window_tracks,
        )
        from poserisk_release_tpu.tracking.sort import Sort

        stride = int(self.cfg.DETECTOR.detection_stride)
        sort = Sort()
        people: Dict[int, Dict[str, list]] = {}
        fps = 0.0
        total = 0
        # Same int8 PTQ lifecycle as Predictor._ingest_and_track_overlapped
        # (pipeline.py): without this, the detector's implicit whole-call
        # calibration would run on window 1 and leave that window detected
        # by the FLOAT graph while every later window uses int8 --
        # inconsistent within one video and divergent from the batch path.
        needs_cal = getattr(self.detector, "needs_calibration", False)
        for item in _window_stream(video_path, self.window, max_frames,
                                   self.cfg.DATASET.decode_workers):
            if item[0] == "meta":
                fps = float(item[1])
            elif item[0] == "window":
                _, start_idx, frames = item
                if needs_cal:
                    self.detector.calibrate(frames)
                    needs_cal = False
                update_window_tracks(
                    sort, people, start_idx, frames, self.detector, stride,
                    adaptive=bool(self.cfg.DETECTOR.adaptive_stride),
                    adaptive_tol=float(self.cfg.DETECTOR.adaptive_tol))
            else:  # end
                total = int(item[1])
        results = finalize_tracks(people)
        if stride > 1:
            results = interpolate_track_gaps(results)
        return results, total, fps

    def _run_two_pass(self, video_path: str, add_info: Dict,
                      max_frames: Optional[int],
                      video_output: Optional[str] = None,
                      video_types: str = "REBA,RULA") -> StreamResult:
        from poserisk_release_tpu.tracking.mpt import filter_and_select_target

        tracking_results, total, fps = self._track_pass(video_path, max_frames)
        result = StreamResult(total_frames=total, fps=fps)
        if not tracking_results:
            # Same contract as the batch Predictor (and the --multi_person
            # streaming branch): a clip with nobody tracked must not look
            # like a successful zero-score run.
            raise ValueError("no person tracks found in the clip")
        bboxes, sel_frames = filter_and_select_target(
            tracking_results, total, self.cfg.DATASET.min_frame_ratio
        )
        sel_frames = np.asarray(sel_frames)
        reba, rula = self._scorers()
        # pass 2: decode again, crop + score only the selected track's
        # frames. Without rendering, decode stops right after the last
        # selected frame -- if the target leaves the clip early, the tail
        # never decodes (windows without selected frames inside the range
        # are skipped below). Rendering needs EVERY clip frame (the batch
        # renderer draws 'Not detected target' tails), so it decodes to the
        # end and writes each window right after scoring it.
        stop_at = int(sel_frames.max()) + 1
        if max_frames is not None:
            stop_at = min(stop_at, max_frames)
        render_plan, video_output = self._build_render_plan(
            reba, rula, video_types, video_output)
        if video_output is not None:
            import os

            os.makedirs(video_output, exist_ok=True)

        if self.estimator._pose_stride > 1:
            # Chunk-aligned scoring: the track accumulates into EXACTLY the
            # batch Predictor's chunk structure, so the slerp anchor phase
            # is keyed to the selected track's own frame index -- scores
            # are bit-identical to the whole-clip path at any stride.
            # Rendering needs the scores at write time, which here lag the
            # windows by up to a chunk, so it runs as its OWN decode pass
            # after scoring completes (still one window of pixels at a
            # time; the render path always decodes the full clip anyway).
            cal = _SpinCalibrator(self.estimator)
            acc = _TrackChunkScorer(self, add_info, reba, rula, result, cal)
            for item in _window_stream(video_path, self.window, stop_at,
                                       self.cfg.DATASET.decode_workers):
                if item[0] != "window":
                    continue
                _, start_idx, frames = item
                mask = ((sel_frames >= start_idx)
                        & (sel_frames < start_idx + len(frames)))
                if mask.any():
                    ids = sel_frames[mask] - start_idx
                    if cal.gathering:
                        cal.gather(frames, ids, bboxes[mask])
                    acc.add(frames, ids, bboxes[mask], int(start_idx))
            acc.flush()
            if video_output is not None:
                self._render_pass(video_path, max_frames, video_output,
                                  render_plan, fps,
                                  [(result, sel_frames, bboxes)])
            return result

        writers: list = []
        if video_output is not None:
            stop_at = max_frames  # rendering draws the whole clip
        try:
            for item in _window_stream(video_path, self.window, stop_at,
                                       self.cfg.DATASET.decode_workers):
                if item[0] != "window":
                    continue
                _, start_idx, frames = item
                mask = ((sel_frames >= start_idx)
                        & (sel_frames < start_idx + len(frames)))
                if mask.any():
                    self._score_window(
                        frames, sel_frames[mask] - start_idx, bboxes[mask],
                        int(start_idx), add_info, reba, rula, result,
                    )
                if video_output is not None:
                    if not writers:
                        from poserisk_release_tpu.outputs.render import (
                            ResultVideoWriter,
                        )

                        writers = [
                            ResultVideoWriter(video_output, title, fps,
                                              frames.shape[1:3],
                                              scorer.eval_items, sel_frames,
                                              bboxes)
                            for title, scorer, _, _ in render_plan
                        ]
                    for writer, (_, _, s_attr, l_attr) in zip(writers,
                                                              render_plan):
                        writer.write_window(frames, int(start_idx),
                                            getattr(result, s_attr),
                                            getattr(result, l_attr))
        finally:
            # Mirror score_all: release writer handles on exception paths
            # too, not just the happy path.
            for writer in writers:
                writer.close()
        return result

    def _build_render_plan(self, reba, rula, video_types: str,
                           video_output: Optional[str]):
        """(render_plan, video_output): the (title, scorer, scores_attr,
        logs_attr) rows video_types selects -- THE one selection rule for
        both streaming modes. When video_output is set but NO family
        matches, rendering is skipped with a warning and video_output
        comes back None (no full-clip decode, no empty person dirs): the
        batch Predictor completes silently on an unmatched score_type, so
        the streaming extension must not abort the run either."""
        wanted = video_types.replace(" ", "").upper().split(",")
        plan = [
            (title, scorer, scores_attr, logs_attr)
            for title, scorer, scores_attr, logs_attr in (
                ("REBA", reba, "reba_scores", "reba_logs"),
                ("RULA", rula, "rula_scores", "rula_logs"),
            )
            if title in wanted
        ]
        if video_output is not None and not plan:
            import warnings

            warnings.warn(
                f"video_types {video_types!r} selects neither REBA nor "
                "RULA; skipping video rendering", stacklevel=3)
            video_output = None
        return plan, video_output

    def _render_pass(self, video_path: str, max_frames: Optional[int],
                     video_output: str, render_plan, fps: float,
                     tracks_to_render) -> None:
        """Render annotated videos from COMPLETE results in a decode pass
        of their own (used when scoring couldn't render in-line, i.e. the
        chunk-aligned pose-stride path). tracks_to_render: list of
        (result, track_frames, track_bboxes[, output_dir]) -- one entry
        per rendered person; output_dir defaults to video_output."""
        from poserisk_release_tpu.outputs.render import ResultVideoWriter

        writers: list = []  # (writer, result, s_attr, l_attr)
        try:
            for item in _window_stream(video_path, self.window, max_frames,
                                       self.cfg.DATASET.decode_workers):
                if item[0] != "window":
                    continue
                _, start_idx, frames = item
                if not writers:
                    for entry in tracks_to_render:
                        result, tr_frames, tr_boxes = entry[:3]
                        out_dir = entry[3] if len(entry) > 3 else video_output
                        for title, scorer, s_attr, l_attr in render_plan:
                            writers.append((
                                ResultVideoWriter(out_dir, title, fps,
                                                  frames.shape[1:3],
                                                  scorer.eval_items,
                                                  tr_frames, tr_boxes),
                                result, s_attr, l_attr))
                for writer, result, s_attr, l_attr in writers:
                    writer.write_window(frames, int(start_idx),
                                        getattr(result, s_attr),
                                        getattr(result, l_attr))
        finally:
            for writer, _result, _s, _l in writers:
                writer.close()

    # -- single-pass online mode ------------------------------------------
    def _run_online(self, video_path: str, add_info: Dict,
                    max_frames: Optional[int]) -> StreamResult:
        from poserisk_release_tpu.tracking.mpt import strided_local_indices

        stride = int(self.cfg.DETECTOR.detection_stride)
        result = StreamResult()
        reba, rula = self._scorers()
        # First-window int8 calibration, same lifecycle as _track_pass.
        needs_cal = getattr(self.detector, "needs_calibration", False)

        # Detection-stride backfill state (stride > 1 only): frames since
        # the last scored target detection wait in a bounded ring; when the
        # NEXT detection of the same identity arrives their boxes are
        # linearly interpolated between the surrounding detections -- the
        # same per-column cxcywh rule as interpolate_track_gaps, so online
        # scores every frame just like the two-pass/batch modes instead of
        # silently dropping (stride-1)/stride of them. EVERY frame between
        # the first and last target detection is scored; the single-pass
        # bounded-memory deviations are in the BOXES, not coverage:
        #  * the ring holds at most one window of pixels (peak memory stays
        #    O(window)); when a gap outgrows it, the OLDEST pending frames
        #    flush with the last detection's box HELD (anchor-hold) -- the
        #    two-pass mode, holding complete tracks, interpolates them
        #    linearly instead;
        #  * on a target-identity switch the pending gap (frames after the
        #    OLD identity's last detection) scores with that identity's last
        #    box held before re-locking -- never a blend of two people's
        #    boxes; the two-pass mode, following one selected track for the
        #    whole clip, has no switches;
        #  * no extrapolation: frames before the first or after the last
        #    target detection are unscored (interpolate_track_gaps rule).
        # The whole policy lives in OnlineTargetTracker (shared with
        # serving.StreamSession); backfill is off at stride 1, where every
        # frame is a detection step and occlusion gaps stay unscored --
        # exactly like the two-pass mode at stride 1 (interpolate_track_gaps
        # only runs under a stride there). Pending entries are VIEWS into
        # the decode window; they are consecutive frames, so at most ~2
        # window buffers stay referenced -- the decode lookahead's own
        # order. Copying would tax every skipped frame for no bound change.
        tracker = OnlineTargetTracker(ring_capacity=self.window,
                                      backfill=stride > 1)

        for item in _window_stream(video_path, self.window, max_frames,
                                   self.cfg.DATASET.decode_workers):
            if item[0] == "meta":
                result.fps = float(item[1])
                continue
            if item[0] == "end":
                result.total_frames = int(item[1])
                break
            _, start_idx, frames = item
            if needs_cal:
                self.detector.calibrate(frames)
                needs_cal = False

            if stride == 1:
                # Detect straight off the window (frames[list] would copy
                # the whole window just to select every frame).
                det_map = dict(enumerate(self._detect(frames)))
            else:
                det_local = strided_local_indices(
                    start_idx, len(frames), stride)
                det_map = dict(zip(
                    det_local,
                    self._detect(frames[det_local]) if det_local else []))
            buf_px: List[np.ndarray] = []
            buf_boxes: List[np.ndarray] = []
            buf_ids: List[int] = []
            for local in range(len(frames)):
                for gidx, rgb, box in tracker.observe(
                        start_idx + local, frames[local],
                        det_map.get(local)):
                    buf_px.append(rgb)
                    buf_boxes.append(box)
                    buf_ids.append(gidx)
            if buf_px:
                # Boxes stay the tracker's native float64 all the way to
                # _score_window (which casts to f32 at the same point the
                # two-pass mode does) -- an early astype would quantize at
                # a different spot than the batch/two-pass flows.
                self._score_window(
                    np.stack(buf_px), np.arange(len(buf_px)),
                    np.stack(buf_boxes), 0, add_info,
                    reba, rula, result,
                    orig_local_ids=np.asarray(buf_ids),
                )
        if not result.frames:
            # Same contract as the two-pass mode and the batch Predictor.
            raise ValueError("no person tracks found in the clip")
        return result

    # -- shared helpers ----------------------------------------------------
    def _detect(self, frames: np.ndarray) -> List[np.ndarray]:
        from poserisk_release_tpu.tracking.mpt import detect_frames

        return detect_frames(self.detector, frames)

    def _scorers(self):
        from poserisk_release_tpu.scoring.reba import REBAScorer
        from poserisk_release_tpu.scoring.rula import RULAScorer

        return REBAScorer(), RULAScorer()

    def write_outputs(self, result: StreamResult, output_path: str,
                      score_type: str = "REBA,RULA") -> Dict:
        """Reference-format result files from a stream result: the
        {title}_score.png plot + {title.lower()}_result.txt (same stats/
        action-level/whitespace semantics as the Predictor, via the SAME
        post_process_scores/format_result_txt code) and a machine-readable
        stream_summary.json. `score_type` filters the emitted families with
        the Predictor's --type parsing (scoring both is free; only the
        output files are gated). No annotated video from THIS method (a
        StreamResult holds no pixels) -- pass video_output to __call__ to
        render the {title}_video.mp4 incrementally during pass 2 instead.
        Returns {title: (final_scores, action_level, action_name)}."""
        import json
        import os

        import os.path as osp

        from poserisk_release_tpu.outputs.stats import (
            post_process_scores,
            scores_summary_block,
            write_result_txt,
        )

        os.makedirs(output_path, exist_ok=True)
        wanted = score_type.replace(" ", "").upper().split(",")
        reba, rula = self._scorers()
        timestamp = (0, np.asarray(result.frames), result.total_frames)
        summary: Dict[str, tuple] = {}
        for title, scorer, scores in (
            ("REBA", reba, result.reba_scores),
            ("RULA", rula, result.rula_scores),
        ):
            if title not in wanted or not scores:
                continue
            final_scores, _, _ = post_process_scores(
                [{"score": s, "log_score": []} for s in scores],
                timestamp, output_path, title=title,
            )
            action_level, action_name = scorer.action_level(final_scores[4])
            write_result_txt(output_path, title, final_scores, action_level,
                             action_name)
            summary[title] = (final_scores, action_level, action_name)
        with open(osp.join(output_path, "stream_summary.json"), "w") as f:
            json.dump(
                {
                    "frames_total": int(result.total_frames),
                    "frames_scored": len(result.frames),
                    "fps": result.fps,
                    # Shared schema with run_summary.json; NaN -> null
                    # (outputs.stats.scores_summary_block).
                    "scores": scores_summary_block(summary),
                },
                f, indent=2,
            )
        return summary

    def _score_window(self, frames, local_ids: np.ndarray,
                      boxes: np.ndarray, start_idx: int, add_info: Dict,
                      reba, rula, result: StreamResult,
                      orig_local_ids: Optional[np.ndarray] = None) -> None:
        # Fused crop+pose (PoseEstimator.run_from_frames): uint8 frames up,
        # angles down, no crop tensor on the host. Chunk by the window size
        # (padded to the mesh size inside): the default frames_per_step chunk
        # would pad a small window up to 64 x n_devices frames of waste.
        # `frames` may be a device array (score_all's shared union upload),
        # in which case local_ids index THAT array and orig_local_ids carries
        # the window-relative frame numbers for bookkeeping.
        euler, joint_cam, _aa = self.estimator.run_from_frames(
            frames, local_ids, np.asarray(boxes, np.float32), chunk=self.window
        )
        if self.validate_rotations:
            from poserisk_release_tpu.pipeline import validate_rotation_roundtrip

            validate_rotation_roundtrip(_aa)
        for r in reba(euler, joint_cam, add_info):
            result.reba_scores.append(r["score"])
            result.reba_logs.append(r["log_score"])
        for r in rula(euler, joint_cam, add_info):
            result.rula_scores.append(r["score"])
            result.rula_logs.append(r["log_score"])
        ids = local_ids if orig_local_ids is None else orig_local_ids
        result.frames.extend(int(start_idx + i) for i in ids)
