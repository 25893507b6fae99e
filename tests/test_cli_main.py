"""Drive cli.main() itself: flag plumbing, YAML override, output artifacts."""

import json
import os.path as osp

import numpy as np

from poserisk_release_tpu.cli import main
from poserisk_release_tpu.io.video import write_video


def test_cli_main_end_to_end(tmp_path, monkeypatch):
    import cv2

    clip = tmp_path / "in.mp4"
    frames = []
    for i in range(8):
        img = np.full((120, 160, 3), 30, np.uint8)
        cv2.rectangle(img, (60, 20), (110, 100), (170, 150, 120), -1)
        frames.append(img)
    write_video(frames, fps=4.0, file_path=str(clip))

    info = tmp_path / "info.json"
    info.write_text(json.dumps({
        "REBA": {"Legs_bilateral_weight_bearing/walking": 0, "Sitting": 0,
                 "Load/Force Score": 0, "Arm_supported_leaning_L": 0,
                 "Arm_supported_leaning_R": 0, "Coupling": 0, "Activity_Score": 0},
        "RULA": {"Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0,
                 "A_Muscle_use_L": 0, "A_Muscle_use_R": 0, "A_Load/Force_L": 0,
                 "A_Load/Force_R": 0, "Legs_bilateral_weight_bearing": 0,
                 "B_Muscle_use": 0, "B_Load/Force": 0},
    }))

    # YAML override flows through --cfg with strict keys.
    cfg_yaml = tmp_path / "override.yaml"
    cfg_yaml.write_text("PARALLEL:\n  frames_per_step: 8\nDATASET:\n  batch_size: 4\n")

    out = tmp_path / "out"
    rc = main([
        "--cpu", "--type", "REBA", "--input", str(clip), "--info", str(info),
        "--output", str(out), "--cfg", str(cfg_yaml), "--num_devices", "1",
        "--profile",
    ])
    assert rc == 0
    assert osp.isfile(osp.join(str(out), "reba_result.txt"))
    assert osp.isfile(osp.join(str(out), "run_summary.json"))
    assert not osp.isfile(osp.join(str(out), "rula_result.txt"))  # --type REBA only


def test_cli_main_bad_cfg_key(tmp_path):
    import pytest

    bad = tmp_path / "bad.yaml"
    bad.write_text("NOPE:\n  x: 1\n")
    with pytest.raises(ValueError, match="not exist in config"):
        main(["--cpu", "--cfg", str(bad), "--input", "x.mp4", "--output", str(tmp_path)])


def test_cli_fast_detector_and_jpeg_flags_plumb_config(monkeypatch, tmp_path):
    """--fast_detector / --jpeg_ingest / --validate_rotations reach the
    Predictor's config without running the pipeline."""
    import poserisk_release_tpu.cli as cli_mod

    captured = {}

    class FakePredictor:
        def __init__(self, cfg=None, **kwargs):
            captured["cfg"] = cfg
            captured["kwargs"] = kwargs

        def __call__(self, *a, **k):
            captured["called"] = True

        timings = {}

    monkeypatch.setattr("poserisk_release_tpu.pipeline.Predictor", FakePredictor)
    rc = cli_mod.main([
        "--cpu", "--input", "x.mp4", "--output", str(tmp_path),
        "--num_devices", "1",
        "--fast_detector", "--jpeg_ingest", "--validate_rotations",
    ])
    assert rc == 0 and captured["called"]
    cfg = captured["cfg"]
    assert cfg.DETECTOR.rect_letterbox and cfg.DETECTOR.int8
    assert cfg.DATASET.jpeg_ingest
    assert captured["kwargs"]["validate_rotations"] is True


def test_cli_detection_stride_plumbs_config(monkeypatch, tmp_path):
    """--detection_stride reaches DetectorConfig.detection_stride."""
    import poserisk_release_tpu.cli as cli_mod

    captured = {}

    class FakePredictor:
        def __init__(self, cfg=None, **kwargs):
            captured["cfg"] = cfg

        def __call__(self, *a, **k):
            captured["called"] = True

        timings = {}

    monkeypatch.setattr("poserisk_release_tpu.pipeline.Predictor", FakePredictor)
    rc = cli_mod.main([
        "--cpu", "--input", "x.mp4", "--output", str(tmp_path),
        "--num_devices", "1", "--detection_stride", "4",
    ])
    assert rc == 0 and captured["called"]
    assert captured["cfg"].DETECTOR.detection_stride == 4


def test_cli_directory_input_scores_every_video(tmp_path):
    """--input <dir>: each video lands in <output>/<stem>/ from ONE warm
    Predictor (the serving path the chunked compiles exist for)."""
    import cv2

    vid_dir = tmp_path / "clips"
    vid_dir.mkdir()
    for name in ("b_second", "a_first"):
        frames = []
        for _ in range(6):
            img = np.full((120, 160, 3), 30, np.uint8)
            cv2.rectangle(img, (60, 20), (110, 100), (170, 150, 120), -1)
            frames.append(img)
        write_video(frames, fps=4.0, file_path=str(vid_dir / f"{name}.mp4"))

    cfg_yaml = tmp_path / "override.yaml"
    cfg_yaml.write_text("PARALLEL:\n  frames_per_step: 8\nDATASET:\n  batch_size: 4\n")
    out = tmp_path / "out"
    rc = main([
        "--cpu", "--type", "REBA", "--input", str(vid_dir),
        "--output", str(out), "--cfg", str(cfg_yaml), "--num_devices", "1",
    ])
    assert rc == 0
    for stem in ("a_first", "b_second"):
        assert osp.isfile(osp.join(str(out), stem, "reba_result.txt")), stem
        assert osp.isfile(osp.join(str(out), stem, "run_summary.json")), stem


def test_cli_directory_input_empty_dir_raises(tmp_path):
    import pytest

    empty = tmp_path / "none"
    empty.mkdir()
    with pytest.raises(ValueError, match="no video files"):
        main(["--cpu", "--input", str(empty), "--output", str(tmp_path / "o")])


def test_input_videos_single_file_passthrough(tmp_path):
    from poserisk_release_tpu.cli import input_videos

    assert input_videos("clip.mp4") == [("clip.mp4", None)]


def test_input_videos_stem_collision_keeps_both(tmp_path):
    """demo.mp4 + demo.mov share the stem 'demo'; mapping both to
    <output>/demo/ would silently overwrite one video's results with the
    other's, so colliding entries keep their extension in the subdir."""
    from poserisk_release_tpu.cli import input_videos

    for name in ("demo.mp4", "demo.mov", "other.mp4"):
        (tmp_path / name).write_bytes(b"")
    got = input_videos(str(tmp_path))
    subdirs = [sub for _, sub in got]
    assert sorted(subdirs) == ["demo_mov", "demo_mp4", "other"]
    assert len(set(subdirs)) == len(subdirs)


def test_profile_report_total_excludes_subintervals():
    """score.device / score.render are sub-intervals of 'score': summing
    them into the total double-counts the scoring window and deflates every
    stage's share."""
    from poserisk_release_tpu.cli import profile_report

    report = profile_report({
        "decode": 1.0,
        "track": 2.0,
        "pose": 3.0,
        "score": 4.0,
        "score.device": 1.5,
        "score.render": 2.0,
    })
    # Total = top-level stages only (10.0), not 13.5.
    assert "total" in report and "10.000s" in report
    assert "13.500" not in report
    # Parent share is vs the correct total; sub-intervals render indented.
    assert "score" in report and " 40.0%" in report
    assert "  score.device" in report and "  score.render" in report


def test_input_videos_rename_collision_with_unique_stem(tmp_path):
    """The collision rename (demo.mp4 -> demo_mp4) must not itself collide
    with another video's unique stem (demo_mp4.avi): every subdir is unique,
    so no two runs can overwrite each other's results."""
    from poserisk_release_tpu.cli import input_videos

    for name in ("demo.mp4", "demo.mov", "demo_mp4.avi"):
        (tmp_path / name).write_bytes(b"")
    got = input_videos(str(tmp_path))
    subdirs = [sub for _, sub in got]
    assert len(set(subdirs)) == len(subdirs) == 3
    # The well-behaved entries keep their documented names.
    assert "demo_mov" in subdirs and "demo_mp4" in subdirs


def test_cli_no_visualize_is_a_real_off_switch(monkeypatch, tmp_path):
    """The preserved reference quirk type=bool makes '--visualize False'
    parse as True; --no_visualize is the documented real off-switch for
    both the batch Predictor and the streaming path (where rendering
    forces a full-clip decode)."""
    import poserisk_release_tpu.cli as cli_mod

    captured = {}

    class FakePredictor:
        def __init__(self, cfg=None, **kwargs):
            captured["kwargs"] = kwargs

        def __call__(self, *a, **k):
            captured["called"] = True

        timings = {}

    monkeypatch.setattr("poserisk_release_tpu.pipeline.Predictor",
                        FakePredictor)
    # The quirk itself: '--visualize False' still means True.
    rc = cli_mod.main(["--cpu", "--input", "x.mp4", "--output",
                       str(tmp_path), "--num_devices", "1",
                       "--visualize", "False"])
    assert rc == 0 and captured["kwargs"]["visualize"] is True
    # The off-switch wins regardless of --visualize.
    rc = cli_mod.main(["--cpu", "--input", "x.mp4", "--output",
                       str(tmp_path), "--num_devices", "1",
                       "--visualize", "True", "--no_visualize"])
    assert rc == 0 and captured["kwargs"]["visualize"] is False

    # Streaming: --no_visualize means no video_output reaches the scorer.
    stream_calls = {}

    class FakeScorer:
        def __init__(self, **kwargs):
            pass

        def __call__(self, video, add_info, video_output=None,
                     video_types=""):
            stream_calls["video_output"] = video_output
            return object()

        def write_outputs(self, result, out, score_type=""):
            return {}

        detector = None
        estimator = None

    monkeypatch.setattr("poserisk_release_tpu.streaming.StreamingScorer",
                        FakeScorer)
    monkeypatch.setattr("poserisk_release_tpu.pipeline.apply_explicit_calibration",
                        lambda *a, **k: None)
    monkeypatch.setattr("poserisk_release_tpu.pipeline.load_add_info",
                        lambda *a, **k: {})
    monkeypatch.setattr("poserisk_release_tpu.pipeline.build_detector",
                        lambda cfg: None)
    monkeypatch.setattr("poserisk_release_tpu.outputs.stats.print_result_summary",
                        lambda *a, **k: None)
    rc = cli_mod.main(["--cpu", "--streaming", "--input", "x.mp4",
                       "--output", str(tmp_path), "--num_devices", "1",
                       "--no_visualize"])
    assert rc == 0 and stream_calls["video_output"] is None
