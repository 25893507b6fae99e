"""Streaming scorer: window boundaries, identity persistence, stat parity."""

import json

import numpy as np
import pytest

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.pipeline import Predictor
from poserisk_release_tpu.streaming import StreamingScorer

def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


import os.path as _osp

import poserisk_release_tpu as _pkg

INFO = json.load(open(_osp.join(_osp.dirname(_pkg.__file__), "default_information.json")))


@pytest.fixture(scope="module")
def long_clip(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("stream") / "long.mp4"
    frames = []
    for i in range(40):
        img = np.full((120, 160, 3), 25, np.uint8)
        cv2.rectangle(img, (40 + i, 20), (90 + i, 110), (180, 150, 130), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=str(path))
    return str(path)


def test_windows_cover_all_frames(long_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=16)
    result = scorer(long_clip, INFO)
    assert result.total_frames == 40
    assert result.fps == 10.0
    assert result.frames == list(range(40))  # identity persisted across windows
    assert len(result.reba_scores) == 40
    assert len(result.rula_scores) == 40


def test_fast_mode_scores_whole_clip(long_clip):
    """StreamingScorer(fast=True) runs the bf16 pose path (and on real TPU
    the Pallas crop); on the CPU mesh the crop stays jnp. bf16 is a
    documented approximation class: random-init weights put a few frames'
    angles within bf16 rounding of the integer-degree rule thresholds, so
    single-step flips on a minority of frames are the expected behavior
    (same class as PARITY.md #1's threshold-straddling frames), not a
    fast-path bug. Random weights are chaotic amplifiers -- ~10% of this
    fixture's frames straddle a threshold at bf16 precision; trained
    weights sit far from that regime. The f32 default path keeps the
    exact class (tested throughout the suite)."""
    slow = StreamingScorer(detector=StubDetector(), window=16)(long_clip, INFO)
    fast = StreamingScorer(detector=StubDetector(), window=16, fast=True)(
        long_clip, INFO
    )
    assert fast.frames == slow.frames
    for name in ("reba_scores", "rula_scores"):
        got, want = np.asarray(getattr(fast, name)), np.asarray(
            getattr(slow, name))
        flips = got != want
        assert flips.mean() <= 0.15, (name, np.where(flips)[0])
        assert np.abs(got - want).max() <= 1, name


def test_stats_match_batch_predictor(long_clip, tmp_path):
    """Windowed scoring must reproduce the whole-clip Predictor's stats."""
    stream = StreamingScorer(detector=StubDetector(), window=16)(long_clip, INFO)

    predictor = Predictor(cfg=_test_config(), score_type="REBA,RULA",
                          detector=StubDetector(), visualize=False)
    summary = predictor(long_clip, "/nonexistent.json", str(tmp_path / "batch"))

    assert stream.stats("reba") == summary["REBA"][0]
    assert stream.stats("rula") == summary["RULA"][0]


def test_max_frames_cap(long_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=8)
    result = scorer(long_clip, INFO, max_frames=20)
    assert result.total_frames == 20
    assert len(result.reba_scores) == 20


class _ScriptedStreamDetector:
    """Cursor-based scripted detector: serves per-frame detection lists across
    window-sized calls (StubDetector's scripted mode assumes one whole-clip
    call, which does not fit the streaming window contract)."""

    def __init__(self, per_frame_dets):
        self.dets = [np.asarray(d, np.float32).reshape(-1, 5) for d in per_frame_dets]
        self.pos = 0

    def __call__(self, frames):
        out = self.dets[self.pos : self.pos + len(frames)]
        self.pos += len(frames)
        return [d.copy() for d in out]


def _contention_dets(n_frames=40):
    """Two-person contention: person A is LARGER but present only in frames
    0..9 (10 < min-frames 0.33*40); person B is smaller but tracked
    throughout. The reference semantics (filter then max MEAN area,
    /root/reference/lib/core/base.py:53-74) must pick B for every frame; a
    naive online largest-first lock picks A first."""
    dets = []
    for i in range(n_frames):
        frame = []
        if i >= 2:  # person B enters at frame 2, tracked to the end
            frame.append([30.0 + i, 20.0, 80.0 + i, 110.0, 0.9])
        if i < 10:
            frame.append([90.0, 5.0, 160.0, 118.0, 0.95])  # person A, large
        dets.append(frame)
    return dets


@pytest.fixture(scope="module")
def contention_clip(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("contention") / "two_people.mp4"
    frames = []
    for i in range(40):
        img = np.full((120, 160, 3), 25, np.uint8)
        cv2.rectangle(img, (30 + i, 20), (80 + i, 110), (180, 150, 130), -1)
        if i < 10:
            cv2.rectangle(img, (90, 5), (160, 118), (90, 200, 90), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=str(path))
    return str(path)


def test_reference_selection_matches_predictor_under_contention(contention_clip, tmp_path):
    """Streaming (selection='reference') == whole-clip Predictor when a large
    short-lived person competes with a smaller persistent one."""
    stream = StreamingScorer(
        detector=_ScriptedStreamDetector(_contention_dets()), window=16
    )(contention_clip, INFO)

    predictor = Predictor(
        cfg=_test_config(), score_type="REBA,RULA",
        detector=StubDetector(scripted=_contention_dets()), visualize=False,
    )
    summary = predictor(contention_clip, "/nonexistent.json", str(tmp_path / "batch"))

    assert stream.stats("reba") == summary["REBA"][0]
    assert stream.stats("rula") == summary["RULA"][0]
    # The selected track must be person B's (present past frame 10).
    assert max(stream.frames) > 20


def test_online_mode_documented_divergence(contention_clip):
    """selection='online' locks the short-lived larger person first -- the
    documented divergence that selection='reference' exists to remove."""
    online = StreamingScorer(
        detector=_ScriptedStreamDetector(_contention_dets()), window=16,
        selection="online",
    )(contention_clip, INFO)
    reference = StreamingScorer(
        detector=_ScriptedStreamDetector(_contention_dets()), window=16,
    )(contention_clip, INFO)
    # Same video, same detections: the two selection policies track different
    # people during the contention interval (frames 0..9).
    assert online.frames != reference.frames


class _BrightnessDetector:
    """Box only on bright frames (windowed-call-safe, unlike scripted mode)."""

    def __call__(self, frames_rgb):
        out = []
        for f in frames_rgb:
            if f.mean() > 80:
                h, w = f.shape[:2]
                out.append(np.array(
                    [[w * 0.25, h * 0.1, w * 0.75, h * 0.95, 0.99]],
                    np.float32))
            else:
                out.append(np.zeros((0, 5), np.float32))
        return out


def test_two_pass_stops_decoding_after_last_selected_frame(
    tmp_path, monkeypatch
):
    """Pass 2 knows the selected frames before decoding, so it must cap the
    re-decode at the last one: a target that leaves a long clip early should
    not cost a full second decode of the tail."""
    import cv2

    path = str(tmp_path / "early_exit.mp4")
    frames = []
    for i in range(40):
        img = np.full((120, 160, 3), 160 if i < 20 else 20, np.uint8)
        if i < 20:
            cv2.rectangle(img, (40, 20), (120, 110), (200, 180, 170), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=path)

    import poserisk_release_tpu.streaming as streaming_mod

    real = streaming_mod._window_stream
    caps = []

    def recording(video_path, window, max_frames, workers=1):
        caps.append(max_frames)
        return real(video_path, window, max_frames, workers)

    monkeypatch.setattr(streaming_mod, "_window_stream", recording)
    result = StreamingScorer(
        cfg=_test_config(), detector=_BrightnessDetector(), window=8
    )(path, INFO)
    assert result.frames, "target must have been tracked"
    assert max(result.frames) <= 19
    # Pass 1 scans the whole clip (selection needs complete tracks); pass 2
    # stops right after the last selected frame.
    assert caps == [None, max(result.frames) + 1]
    assert result.total_frames == 40


def _two_survivor_dets(n_frames=40):
    """Both people exceed the min-frames filter (0.33*40 = 13.2): A spans
    frames 0..24, B spans 2..39 -- multi-person scoring must score BOTH."""
    dets = []
    for i in range(n_frames):
        frame = []
        if i >= 2:
            frame.append([30.0 + i, 20.0, 80.0 + i, 110.0, 0.9])
        if i < 25:
            frame.append([90.0, 5.0, 160.0, 118.0, 0.95])
        dets.append(frame)
    return dets


@pytest.fixture(scope="module")
def two_person_clip(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("multi") / "two_survivors.mp4"
    frames = []
    for i in range(40):
        img = np.full((120, 160, 3), 25, np.uint8)
        cv2.rectangle(img, (30 + i, 20), (80 + i, 110), (180, 150, 130), -1)
        if i < 25:
            cv2.rectangle(img, (90, 5), (160, 118), (90, 200, 90), -1)
        frames.append(img)
    write_video(frames, fps=10.0, file_path=str(path))
    return str(path)


def test_score_all_matches_batch_multi_person(two_person_clip, tmp_path):
    """Streaming score_all == batch Predictor --multi_person: same surviving
    identities, same per-person stats, from one bounded-memory re-decode."""
    results = StreamingScorer(
        detector=_ScriptedStreamDetector(_two_survivor_dets()), window=16
    ).score_all(two_person_clip, INFO)

    predictor = Predictor(
        cfg=_test_config(), score_type="REBA,RULA",
        detector=StubDetector(scripted=_two_survivor_dets()),
        visualize=False, multi_person=True,
    )
    summaries = predictor(two_person_clip, "/nonexistent.json",
                          str(tmp_path / "batch"))

    assert len(results) == len(summaries) == 2
    # SORT's track-id counter is global across instances, so absolute ids
    # differ between the two runs; discovery ORDER is the stable key.
    for spid, bpid in zip(sorted(results), sorted(summaries)):
        res = results[spid]
        assert res.stats("reba") == summaries[bpid]["REBA"][0]
        assert res.stats("rula") == summaries[bpid]["RULA"][0]
        assert res.total_frames == 40


def test_stats_on_empty_stream_raises_clearly():
    """Round-3 review: a stream that scored zero frames (e.g. the online
    mode never saw a detection) must raise a clear ValueError from stats(),
    not numpy's 'zero-size array to reduction operation maximum'."""
    from poserisk_release_tpu.streaming import StreamResult

    with pytest.raises(ValueError, match="no scored frames"):
        StreamResult().stats("reba")


def test_stats_shares_the_one_stat_implementation():
    """StreamResult.stats must be the SAME code as the Predictor's
    post-processing (outputs.stats.final_scores_stats) so the reference's
    stat semantics cannot fork between the batch and streaming paths."""
    from poserisk_release_tpu.outputs.stats import final_scores_stats
    from poserisk_release_tpu.streaming import StreamResult

    scores = [2, 2, 8, 8, 5, 3, 7, 1, 9, 4]
    res = StreamResult(reba_scores=list(scores))
    assert res.stats("reba") == final_scores_stats(scores)
    assert res.stats("reba")[4] == 2  # scipy mode: smallest modal on ties


def test_mid_clip_decode_failure_surfaces_not_clean_eof(long_clip, monkeypatch):
    """Round-3 review: an exception inside the decode thread used to emit a
    normal ("end", idx) from its finally block -- the consumer scored a
    silent prefix of the video with an inflated total. It must surface as a
    RuntimeError instead."""
    import poserisk_release_tpu.io.video as video_mod
    import poserisk_release_tpu.streaming as streaming_mod

    real = video_mod._decoded_rgb

    def dying(cap, width, height, max_frames=None):
        for idx, rgb in real(cap, width, height, max_frames=max_frames):
            if idx == 19:
                raise MemoryError("synthetic mid-clip decode failure")
            yield idx, rgb

    # _decode_windows imports the helpers inside the function body, so the
    # io.video module attribute is the one binding to patch.
    monkeypatch.setattr(video_mod, "_decoded_rgb", dying)
    scorer = StreamingScorer(detector=StubDetector(), window=8)
    with pytest.raises(RuntimeError, match="decode failed after frame"):
        scorer(long_clip, INFO)


def test_missing_video_still_raises_file_not_found():
    scorer = StreamingScorer(detector=StubDetector(), window=8)
    with pytest.raises(FileNotFoundError, match="cannot open video"):
        scorer("/nonexistent/clip.mp4", INFO)


def test_score_all_rejects_online_selection(two_person_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=16,
                             selection="online")
    with pytest.raises(ValueError, match="two-pass"):
        scorer.score_all(two_person_clip, INFO)


def test_cli_streaming_multi_person_layout(tmp_path, two_person_clip, monkeypatch):
    """--streaming --multi_person writes person_<id>/ directories with the
    same layout as the batch extension."""
    import os.path as osp

    from poserisk_release_tpu import cli as cli_mod
    from poserisk_release_tpu.models.detector import StubDetector as _SD

    monkeypatch.setattr(
        "poserisk_release_tpu.pipeline.build_detector",
        lambda cfg: _ScriptedStreamDetector(_two_survivor_dets()),
    )
    out = str(tmp_path / "out")
    rc = cli_mod.main([
        "--cpu", "--streaming", "--multi_person", "--type", "REBA",
        "--streaming_window", "16",
        "--input", two_person_clip, "--info", "missing.json",
        "--output", out,
    ])
    assert rc == 0
    person_dirs = sorted(d for d in __import__("os").listdir(out)
                         if d.startswith("person_"))
    assert len(person_dirs) == 2
    for d in person_dirs:
        assert osp.isfile(osp.join(out, d, "reba_result.txt"))
        assert osp.isfile(osp.join(out, d, "stream_summary.json"))


# ---------------------------------------------------------------------------
# Round-3 ninth review batch: lifecycle/contract regressions.


class _CalibrationOrderDetector(StubDetector):
    """needs_calibration detector recording whether any window was ever
    detected BEFORE calibrate() ran (the within-video float/int8
    inconsistency the batch ingest explicitly prevents)."""

    def __init__(self):
        self.calibrate_calls = 0
        self.detected_before_calibration = 0

    @property
    def needs_calibration(self):
        return self.calibrate_calls == 0

    def calibrate(self, frames_rgb):
        self.calibrate_calls += 1

    def __call__(self, frames_rgb):
        if self.needs_calibration:
            self.detected_before_calibration += 1
        return super().__call__(frames_rgb)


@pytest.mark.parametrize("selection", ["reference", "online"])
def test_first_window_calibrates_before_any_detection(long_clip, selection):
    """Same int8 PTQ lifecycle as the batch ingest (pipeline.py): the first
    decoded window calibrates explicitly, then EVERY window -- including the
    first -- is detected through the quantized graph."""
    det = _CalibrationOrderDetector()
    StreamingScorer(detector=det, window=16, selection=selection)(
        long_clip, INFO)
    assert det.calibrate_calls == 1
    assert det.detected_before_calibration == 0


class _NothingDetector:
    def __call__(self, frames_rgb):
        return [np.zeros((0, 5), np.float32) for _ in range(len(frames_rgb))]


@pytest.mark.parametrize("selection", ["reference", "online"])
def test_no_tracks_raises_like_batch_predictor(long_clip, selection):
    """A clip with nobody tracked must not look like a successful zero-score
    run (the batch Predictor and the --multi_person streaming branch raise
    the same message)."""
    scorer = StreamingScorer(detector=_NothingDetector(), window=16,
                             selection=selection)
    with pytest.raises(ValueError, match="no person tracks"):
        scorer(long_clip, INFO)


def test_gender_reaches_the_pose_estimator():
    """--streaming --gender must score with the requested SMPL body model,
    not silently fall back to neutral."""
    from poserisk_release_tpu.body.smpl import SMPLFamily

    cfg = _test_config()
    scorer = StreamingScorer(cfg=cfg, detector=StubDetector(),
                             gender="female")
    female = SMPLFamily(cfg.SPIN.smpl_model_dir)["female"]
    np.testing.assert_array_equal(
        np.asarray(scorer.estimator.smpl_params["v_template"]),
        np.asarray(female.v_template, np.float32),
    )


def test_validate_rotations_smoke(long_clip):
    """StreamingScorer(validate_rotations=True) runs the shared euler
    round-trip guard per window without changing scores."""
    plain = StreamingScorer(detector=StubDetector(), window=16)(long_clip, INFO)
    guarded = StreamingScorer(detector=StubDetector(), window=16,
                              validate_rotations=True)(long_clip, INFO)
    assert guarded.reba_scores == plain.reba_scores
    assert guarded.rula_scores == plain.rula_scores


def test_decode_setup_failure_raises_instead_of_hanging(monkeypatch):
    """A decode-thread setup failure OTHER than a missing file (cv2 import
    error on a headless host, raising backend constructor) must surface as
    an exception -- a thread dying before its first emit used to leave the
    consumer blocked forever on q.get()."""
    from poserisk_release_tpu import streaming as streaming_mod

    def boom(path):
        raise RuntimeError("libGL.so.1: cannot open shared object file")

    monkeypatch.setattr("poserisk_release_tpu.io.video._open_video", boom)
    with pytest.raises(RuntimeError, match="decode setup failed"):
        for _ in streaming_mod._window_stream("whatever.mp4", 16, None):
            pass


# ---------------------------------------------------------------------------
# Incremental annotated-video rendering (pass 2, bounded memory).


def _decoded_video(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def _early_exit_dets(n_frames=40, tracked=30):
    """Target tracked only in frames 0..tracked-1: the tail exercises the
    renderer's 'Not detected target' branch AND the full-clip decode that
    rendering requires (the scoring-only pass stops after the last selected
    frame)."""
    box = [30.0, 20.0, 80.0, 110.0, 0.9]
    return [[box] if i < tracked else [] for i in range(n_frames)]


def test_streaming_video_frame_exact_vs_batch_renderer(tmp_path, long_clip):
    """The incrementally rendered {REBA,RULA}_video.mp4 must decode to the
    SAME frames as the batch Predictor's whole-clip render on an identical
    clip/track (outputs.render.ResultVideoWriter docstring: the side
    panel's even-snapped reads only look backward)."""
    batch_out = str(tmp_path / "batch")
    stream_out = str(tmp_path / "stream")

    predictor = Predictor(cfg=_test_config(), score_type="REBA,RULA",
                          detector=_ScriptedStreamDetector(_early_exit_dets()),
                          visualize=True)
    predictor(long_clip, "/nonexistent.json", batch_out)

    scorer = StreamingScorer(detector=_ScriptedStreamDetector(_early_exit_dets()),
                             window=16)
    scorer(long_clip, INFO, video_output=stream_out)

    import os.path as osp

    for title in ("REBA", "RULA"):
        b = _decoded_video(osp.join(batch_out, f"{title}_video.mp4"))
        s = _decoded_video(osp.join(stream_out, f"{title}_video.mp4"))
        assert b.shape == s.shape, title
        np.testing.assert_array_equal(b, s, err_msg=title)


def test_streaming_video_type_filter_and_online_rejection(tmp_path, long_clip):
    scorer = StreamingScorer(detector=StubDetector(), window=16)
    out = str(tmp_path / "reba_only")
    scorer(long_clip, INFO, video_output=out, video_types="REBA")
    import os.path as osp

    assert osp.isfile(osp.join(out, "REBA_video.mp4"))
    assert not osp.exists(osp.join(out, "RULA_video.mp4"))

    online = StreamingScorer(detector=StubDetector(), window=16,
                             selection="online")
    with pytest.raises(ValueError, match="two-pass"):
        online(long_clip, INFO, video_output=str(tmp_path / "x"))


def test_score_all_videos_frame_exact_vs_batch_multi_person(
        two_person_clip, tmp_path):
    """score_all(video_output=...) renders each surviving track's annotated
    videos into person_<id>/ -- frame-exact vs the batch --multi_person
    renderer on the same clip."""
    stream_out = str(tmp_path / "stream")
    results = StreamingScorer(
        detector=_ScriptedStreamDetector(_two_survivor_dets()), window=16
    ).score_all(two_person_clip, INFO, video_output=stream_out)

    batch_out = str(tmp_path / "batch")
    predictor = Predictor(
        cfg=_test_config(), score_type="REBA,RULA",
        detector=StubDetector(scripted=_two_survivor_dets()),
        visualize=True, multi_person=True,
    )
    summaries = predictor(two_person_clip, "/nonexistent.json", batch_out)

    import os.path as osp

    # Track-id counters are global across SORT instances; discovery order
    # is the stable correspondence (same convention as the stats test).
    for spid, bpid in zip(sorted(results), sorted(summaries)):
        for title in ("REBA", "RULA"):
            s = _decoded_video(
                osp.join(stream_out, f"person_{spid}", f"{title}_video.mp4"))
            b = _decoded_video(
                osp.join(batch_out, f"person_{bpid}", f"{title}_video.mp4"))
            assert s.shape == b.shape, (title, spid)
            np.testing.assert_array_equal(s, b, err_msg=f"{title}/{spid}")


def test_unrenderable_video_types_warn_and_skip_rendering(tmp_path, long_clip):
    """video_output with a video_types string matching neither family used
    to decode the whole clip for nothing (and, in score_all, leave empty
    person_<id>/ directories). It must not abort the run either -- the
    batch Predictor completes silently on an unmatched score_type -- so
    rendering is skipped with a warning and scoring proceeds."""
    scorer = StreamingScorer(detector=StubDetector(), window=16)
    with pytest.warns(UserWarning, match="neither REBA nor RULA"):
        res = scorer(long_clip, INFO, video_output=str(tmp_path / "x"),
                     video_types="NONSENSE")
    assert len(res.reba_scores) == 40  # scoring unaffected
    assert not (tmp_path / "x").exists()  # no dir, no videos, no full decode
    with pytest.warns(UserWarning, match="neither REBA nor RULA"):
        results = scorer.score_all(long_clip, INFO,
                                   video_output=str(tmp_path / "y"),
                                   video_types="NONSENSE")
    assert results and not (tmp_path / "y").exists()


def test_render_writers_closed_on_mid_clip_exception(tmp_path, long_clip,
                                                     monkeypatch):
    """An exception mid-clip (decode failure, scoring error, rotation
    validation assert) must still release the cv2.VideoWriter handles --
    they used to leak (unreleased/corrupt mp4s) on any non-happy path."""
    from poserisk_release_tpu.outputs.render import ResultVideoWriter

    closed = []
    orig_close = ResultVideoWriter.close

    def spy_close(self):
        closed.append(self)
        orig_close(self)

    monkeypatch.setattr(ResultVideoWriter, "close", spy_close)

    scorer = StreamingScorer(detector=StubDetector(), window=16)
    orig = scorer._score_window
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:  # first window scores, writers exist by then
            raise RuntimeError("scoring failed mid-clip")
        return orig(*a, **k)

    monkeypatch.setattr(scorer, "_score_window", flaky)
    with pytest.raises(RuntimeError, match="mid-clip"):
        scorer(long_clip, INFO, video_output=str(tmp_path / "leak"),
               video_types="REBA")
    assert len(closed) == 1  # the REBA writer was released despite the error


# -- online-mode detection-stride backfill --------------------------------


def _strided_dets(n_frames: int, stride: int, missing=()):
    """Per-STRIDED-frame detection lists (frames 0, stride, 2*stride, ...)
    with a box that moves every frame; steps whose GLOBAL index is in
    `missing` return no detections (simulated occlusion)."""
    return [
        [] if g in missing else [[20.0 + g, 15.0, 70.0 + g, 105.0, 0.9]]
        for g in range(0, n_frames, stride)
    ]


def _capture_score_boxes(scorer):
    """Shadow _score_window on the instance to record the exact
    (global_frame -> bbox) pairs each flush feeds the pose path."""
    orig = scorer._score_window
    seen = {}

    def spy(frames, local_ids, boxes, start_idx, *args, **kwargs):
        ids = kwargs.get("orig_local_ids")
        ids = local_ids if ids is None else ids
        for gid, box in zip(np.asarray(ids) + start_idx, np.asarray(boxes)):
            seen[int(gid)] = np.asarray(box, np.float64)
        return orig(frames, local_ids, boxes, start_idx, *args, **kwargs)

    scorer._score_window = spy
    return seen


def test_online_stride_backfills_every_frame(long_clip):
    """Under detection_stride > 1 the online mode must score EVERY frame
    between the target's first and last detection (boxes interpolated
    between surrounding detections), matching the two-pass mode -- it used
    to silently drop (stride-1)/stride of the frames."""
    cfg = default_config().replace(DETECTOR={"detection_stride": 4})
    online = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(_strided_dets(40, 4)),
        window=16, selection="online")
    two = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(_strided_dets(40, 4)),
        window=16)
    online_boxes = _capture_score_boxes(online)
    two_boxes = _capture_score_boxes(two)
    r_online = online(long_clip, INFO)
    r_two = two(long_clip, INFO)

    # detections at 0,4,...,36: every interior frame is backfilled
    assert r_online.frames == list(range(37))
    assert r_online.frames == r_two.frames
    assert r_online.reba_scores == r_two.reba_scores
    assert r_online.rula_scores == r_two.rula_scores
    # and the interpolated boxes are numerically the two-pass gap rule
    assert sorted(online_boxes) == sorted(two_boxes)
    for gid in two_boxes:
        np.testing.assert_allclose(online_boxes[gid], two_boxes[gid],
                                   rtol=0, atol=1e-9)


def test_online_stride_occlusion_gap_matches_two_pass(long_clip):
    """A missed detection step (occlusion) inside the stride pattern: both
    modes see the same SORT output stream, so the online backfill must
    interpolate exactly the frames the two-pass mode does."""
    cfg = default_config().replace(DETECTOR={"detection_stride": 4})
    dets = _strided_dets(40, 4, missing={16})
    online = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(list(dets)), window=16,
        selection="online")
    two = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(list(dets)), window=16)
    r_online = online(long_clip, INFO)
    r_two = two(long_clip, INFO)
    assert r_online.frames == r_two.frames
    assert r_online.reba_scores == r_two.reba_scores
    assert r_online.rula_scores == r_two.rula_scores


def test_online_stride_over_window_gap_scores_every_frame(long_clip):
    """A gap longer than one window of pixels no longer loses its oldest
    frames: the ring flushes them with the last detection's box HELD
    (anchor-hold), and the newest `window` of them still interpolate to the
    resuming detection -- coverage is complete, only the box rule degrades
    for the flushed prefix."""
    cfg = default_config().replace(DETECTOR={"detection_stride": 4})
    # miss the step at frame 16; SORT's min_hits=3 means outputs resume at
    # frame 28, so the pending gap 13..27 (15 frames) exceeds window=4:
    # 13..23 evict with the frame-12 box held, 24..27 interpolate 12 -> 28.
    dets = _strided_dets(40, 4, missing={16})
    online = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(dets), window=4,
        selection="online")
    boxes = _capture_score_boxes(online)
    r = online(long_clip, INFO)
    assert r.frames == list(range(37))
    b12, b28 = boxes[12], boxes[28]  # the tracker's own anchor boxes
    assert np.abs(b28 - b12).max() > 1.0  # the target moved: hold != interp
    for g in range(13, 24):  # flushed prefix: anchor-hold
        np.testing.assert_allclose(boxes[g], b12, atol=1e-9)
    for g in range(24, 28):  # ring remainder: two-pass linear rule
        np.testing.assert_allclose(
            boxes[g], b12 + (b28 - b12) * (g - 12) / 16.0, atol=1e-9)


def test_online_stride_target_switch_scores_pending_gap(long_clip):
    """When the followed identity dies and a NEW person becomes the target,
    the pending gap (frames after the old identity's last detection) is
    scored with the OLD identity's last box held before re-locking -- never
    a blend of two people's boxes, and never dropped pixels."""
    cfg = default_config().replace(DETECTOR={"detection_stride": 4})
    dets = []
    for g in range(0, 40, 4):
        if g <= 12:   # person A, left side
            dets.append([[20.0, 15.0, 70.0, 105.0, 0.9]])
        elif g >= 16:  # person B, right side (A never reappears)
            dets.append([[100.0, 15.0, 150.0, 105.0, 0.9]])
    online = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(dets), window=16,
        selection="online")
    boxes = _capture_score_boxes(online)
    r = online(long_clip, INFO)
    # A output at 0..12 (backfilled); B's track outputs start at 28
    # (min_hits=3); the 13..27 gap spans the switch: scored with A's last
    # box held, then B takes over at 28.
    assert r.frames == list(range(37))
    a_last, b_first = boxes[12], boxes[28]
    assert np.abs(b_first - a_last).max() > 10.0  # two different people
    for g in range(13, 28):
        np.testing.assert_allclose(boxes[g], a_last, atol=1e-9)


# -- pose-stride anchor-phase unification (streaming == batch) ------------


def _batch_track_oracle(clip, cfg, detector, window=16):
    """The batch Predictor's production semantics on `clip`: whole-clip
    pixels through run_from_frames' own chunking on the selected track.
    Tracking reuses the SHARED _track_pass so both sides see the same
    SORT stream; only the POSE/SCORE stage differs from streaming."""
    from poserisk_release_tpu.io.video import read_video
    from poserisk_release_tpu.tracking.mpt import filter_and_select_target

    oracle = StreamingScorer(cfg=cfg, detector=detector, window=window)
    tracking, total, _fps = oracle._track_pass(clip, None)
    bboxes, sel = filter_and_select_target(
        tracking, total, cfg.DATASET.min_frame_ratio)
    clip_frames = read_video(clip).frames
    euler, jc, _aa = oracle.estimator.run_from_frames(
        clip_frames, np.asarray(sel), bboxes)
    reba, rula = oracle._scorers()
    return {
        "frames": [int(f) for f in np.asarray(sel)],
        "reba": [r["score"] for r in reba(euler, jc, INFO)],
        "reba_logs": [r["log_score"] for r in reba(euler, jc, INFO)],
        "rula": [r["score"] for r in rula(euler, jc, INFO)],
    }


@pytest.mark.parametrize("window", [4, 16])
def test_two_pass_pose_stride_bit_exact_vs_batch(long_clip, window):
    """At pose_stride > 1 streaming must equal the batch path bit-exactly
    on a MOVING clip: the track accumulates into the batch chunk structure
    (_TrackChunkScorer), so anchors, interpolation groups, and padding all
    land identically -- whether a chunk completes inside one window
    (window=16 > chunk=8) or spans windows (window=4 < chunk=8)."""
    cfg = default_config().replace(PARALLEL={"frames_per_step": 8},
                                   SPIN={"pose_stride": 4})
    res = StreamingScorer(cfg=cfg, detector=StubDetector(),
                          window=window)(long_clip, INFO)
    want = _batch_track_oracle(long_clip, cfg, StubDetector(), window)
    assert res.frames == want["frames"]
    assert res.reba_scores == want["reba"]
    assert res.reba_logs == want["reba_logs"]  # angle strings: bit-level
    assert res.rula_scores == want["rula"]


def test_two_pass_pose_stride_render_does_not_perturb_scores(
        tmp_path, long_clip):
    """Under a pose stride the renderer runs as its own decode pass from
    the complete result; it must produce the videos without changing a
    single score vs the no-render run."""
    cfg = default_config().replace(PARALLEL={"frames_per_step": 8},
                                   SPIN={"pose_stride": 4})
    plain = StreamingScorer(cfg=cfg, detector=StubDetector(),
                            window=16)(long_clip, INFO)
    out = tmp_path / "vid"
    rendered = StreamingScorer(cfg=cfg, detector=StubDetector(), window=16)(
        long_clip, INFO, video_output=str(out), video_types="REBA")
    assert rendered.reba_scores == plain.reba_scores
    assert rendered.frames == plain.frames
    reba_mp4 = out / "REBA_video.mp4"
    assert reba_mp4.exists() and reba_mp4.stat().st_size > 0
    assert not (out / "RULA_video.mp4").exists()  # video_types filter


def test_score_all_pose_stride_bit_exact_vs_batch(two_person_clip):
    """Multi-person streaming at pose_stride > 1: every surviving track's
    scores equal the batch path run on that track."""
    from poserisk_release_tpu.io.video import read_video
    from poserisk_release_tpu.tracking.mpt import surviving_tracks

    cfg = default_config().replace(PARALLEL={"frames_per_step": 8},
                                   SPIN={"pose_stride": 4})
    results = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(_two_survivor_dets()),
        window=16,
    ).score_all(two_person_clip, INFO)
    assert len(results) == 2

    oracle = StreamingScorer(
        cfg=cfg, detector=_ScriptedStreamDetector(_two_survivor_dets()),
        window=16)
    tracking, total, _fps = oracle._track_pass(two_person_clip, None)
    survivors = surviving_tracks(tracking, total,
                                 cfg.DATASET.min_frame_ratio)
    clip_frames = read_video(two_person_clip).frames
    reba, rula = oracle._scorers()
    # SORT's id counter is global across instances; discovery order is the
    # stable key (same convention as test_score_all_matches_batch_...).
    for spid, opid in zip(sorted(results), sorted(survivors)):
        tr = survivors[opid]
        euler, jc, _aa = oracle.estimator.run_from_frames(
            clip_frames, np.asarray(tr["frames"]), np.asarray(tr["bbox"]))
        assert results[spid].frames == [int(f) for f in tr["frames"]]
        assert results[spid].reba_scores == [
            r["score"] for r in reba(euler, jc, INFO)]
        assert results[spid].rula_scores == [
            r["score"] for r in rula(euler, jc, INFO)]


def test_track_chunk_scorer_copies_anchor_pixels():
    """The chunk accumulator must COPY anchor pixels out of the decode
    window: a view would pin every window the chunk spans (stride x the
    documented memory bound) until the flush."""
    from poserisk_release_tpu.streaming import (
        StreamResult,
        _SpinCalibrator,
        _TrackChunkScorer,
    )

    cfg = default_config().replace(SPIN={"pose_stride": 2})
    scorer = StreamingScorer(cfg=cfg, detector=StubDetector(), window=8)
    reba, rula = scorer._scorers()
    acc = _TrackChunkScorer(scorer, INFO, reba, rula, StreamResult(),
                            _SpinCalibrator(scorer.estimator))
    window = np.zeros((8, 32, 32, 3), np.uint8)
    acc.add(window, np.arange(4), np.zeros((4, 4), np.float64), 0)
    assert acc._anchor_px and all(
        not np.shares_memory(a, window) for a in acc._anchor_px)
