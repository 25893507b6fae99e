"""End-to-end pipeline tests on synthetic video with the stub detector."""

import json
import os.path as osp

import numpy as np
import pytest

import jax

from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.io.video import write_video
from poserisk_release_tpu.models.detector import StubDetector
from poserisk_release_tpu.parallel.mesh import make_mesh
from poserisk_release_tpu.pipeline import Predictor


def _test_config():
    from poserisk_release_tpu.config import default_config

    return default_config().replace(PARALLEL={"frames_per_step": 16})


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory, rng):
    """A small clip with a moving bright 'person' rectangle."""
    import cv2

    path = tmp_path_factory.mktemp("clip") / "input.mp4"
    frames = []
    for i in range(24):
        img = np.full((240, 320, 3), 30, np.uint8)
        x = 100 + 2 * i
        cv2.rectangle(img, (x, 60), (x + 60, 200), (180, 150, 120), -1)
        frames.append(img)
    write_video(frames, fps=12.0, file_path=str(path))
    return str(path)


@pytest.fixture(scope="module")
def info_path(tmp_path_factory):
    info = {
        "REBA": {
            "Legs_bilateral_weight_bearing/walking": 1, "Sitting": 1,
            "Load/Force Score": 0, "Arm_supported_leaning_L": 0,
            "Arm_supported_leaning_R": 0, "Coupling": 0, "Activity_Score": 0,
        },
        "RULA": {
            "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0,
            "A_Muscle_use_L": 0, "A_Muscle_use_R": 0, "A_Load/Force_L": 0,
            "A_Load/Force_R": 0, "Legs_bilateral_weight_bearing": 0,
            "B_Muscle_use": 0, "B_Load/Force": 0,
        },
    }
    path = tmp_path_factory.mktemp("info") / "additional_information.json"
    path.write_text(json.dumps(info))
    return str(path)


@pytest.fixture(scope="module")
def predictor():
    return Predictor(
        cfg=_test_config(),
        score_type="REBA,RULA",
        debug=True,
        debug_joints="Neck,L_Hip",
        detector=StubDetector(),
        visualize=True,
        # Exercises the bucket-padded euler round-trip check on every full
        # run (valid rot6d-head rotmats must round-trip under the 0.1 bound).
        validate_rotations=True,
    )


def test_full_run_outputs(predictor, synthetic_video, info_path, tmp_path):
    out = str(tmp_path / "out")
    summary = predictor(synthetic_video, info_path, out)

    assert set(summary.keys()) == {"REBA", "RULA"}
    for title in ("reba", "rula"):
        txt = open(osp.join(out, f"{title}_result.txt")).read()
        assert txt.startswith("AVG Score: ")
        assert "\nMODE Score: " in txt
        assert "\nAction level: " in txt
    # REBA has a trailing space after the action name; RULA doesn't.
    assert open(osp.join(out, "reba_result.txt")).read().endswith(" ")
    assert not open(osp.join(out, "rula_result.txt")).read().endswith(" ")

    for f in ("REBA_score.png", "RULA_score.png", "REBA_video.mp4", "RULA_video.mp4"):
        assert osp.isfile(osp.join(out, f)), f

    debug = osp.join(out, "debug")
    for f in (
        "pose_log.csv", "REBA_score_log.csv", "REBA_eval_pose_log.csv",
        "RULA_score_log.csv", "RULA_eval_pose_log.csv",
    ):
        assert osp.isfile(osp.join(debug, f)), f

    # score_log rows cover all clip frames; header matches eval_items.
    lines = open(osp.join(debug, "REBA_score_log.csv")).read().splitlines()
    assert lines[0].split(",")[:3] == ["Frame", "Final_score", "Joint Score"]
    assert len(lines) == 1 + 24

    # pose_log has the two requested joints.
    header = open(osp.join(debug, "pose_log.csv")).readline().strip().split(",")
    assert header[:2] == ["Frame", "Joint Pose"]
    assert header[2:] == ["Neck", "L_Hip"]


def test_debug_frame_branch(synthetic_video, info_path, tmp_path):
    predictor = Predictor(
        cfg=_test_config(), debug=True, debug_frame=5,
        detector=StubDetector(), visualize=False,
    )
    out = str(tmp_path / "dbg")
    result = predictor(synthetic_video, info_path, out)
    assert result is None  # early return, no scoring
    assert osp.isfile(osp.join(out, "debug", "smpl_model.obj"))
    assert osp.isfile(osp.join(out, "debug", "joint_3d.png"))
    assert not osp.isfile(osp.join(out, "reba_result.txt"))
    first = open(osp.join(out, "debug", "smpl_model.obj")).readline()
    assert first.startswith("v ")


def test_missing_info_falls_back_to_default(predictor, synthetic_video, tmp_path):
    out = str(tmp_path / "fallback")
    summary = predictor(synthetic_video, "/nonexistent/info.json", out)
    assert "REBA" in summary


def test_pose_estimator_empty_input_returns_empty():
    """Empty-in/empty-out (the detector's pinned contract class): zero crops
    or zero tracked frames must not crash in np.concatenate([])."""
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg = _test_config()
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    e, jc, aa = est.run(np.zeros((0, 224, 224, 3), np.float32))
    assert e.shape == jc.shape == aa.shape == (0, 24, 3)
    e2, _, _ = est.run_from_frames(
        np.zeros((4, 60, 80, 3), np.uint8), np.zeros((0,), np.int64),
        np.zeros((0, 4), np.float32))
    assert e2.shape == (0, 24, 3)


def test_pose_estimator_many_chunks_bounded_pipeline(rng):
    """More chunks than the in-flight cap: the bounded dispatch/fetch loop
    must return the same results (and order) as a single-chunk run."""
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg = default_config().replace(PARALLEL={"frames_per_step": 4})
    est = PoseEstimator(cfg, SMPLFamily(cfg.SPIN.smpl_model_dir))
    crops = rng.uniform(0, 1, (26, 224, 224, 3)).astype(np.float32)
    e_many, jc_many, _ = est.run(crops)          # 7 chunks > cap of 4
    e_one, jc_one, _ = est.run(crops, chunk=32)  # single chunk
    assert e_many.shape == (26, 24, 3)
    np.testing.assert_allclose(e_many, e_one, atol=2e-3)
    np.testing.assert_allclose(jc_many, jc_one, atol=2e-3)


def test_invalid_debug_joint_rejected():
    with pytest.raises(ValueError, match="Invalid Joint name"):
        Predictor(cfg=_test_config(), debug_joints="NotAJoint", detector=StubDetector())


def test_multichip_mesh_run(synthetic_video, info_path, tmp_path):
    """Same pipeline sharded over the virtual 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    predictor = Predictor(
        cfg=_test_config(), score_type="REBA",
        detector=StubDetector(), visualize=False, mesh=mesh,
    )
    out = str(tmp_path / "mesh_out")
    summary = predictor(synthetic_video, info_path, out)
    assert "REBA" in summary

    # Single-device result must match the sharded one exactly.
    single = Predictor(
        cfg=_test_config(), score_type="REBA",
        detector=StubDetector(), visualize=False,
    )
    out2 = str(tmp_path / "single_out")
    summary2 = single(synthetic_video, info_path, out2)
    assert summary["REBA"][0] == summary2["REBA"][0]


def test_config_driven_parallel_predictor(synthetic_video, info_path, tmp_path):
    """VERDICT r4 item 1: a CONFIG-driven Predictor (no mesh plumbing --
    PARALLEL.model / PARALLEL.expert set, PoseEstimator builds the mesh)
    passes the same parity oracle as the explicit-mesh run: identical
    aggregate REBA scores to the single-device Predictor. Small crops keep
    the sharded compiles cheap; the stack is resolution-polymorphic."""
    small = default_config().replace(
        MODEL={"input_shape": (64, 64)}, PARALLEL={"frames_per_step": 8})
    single = Predictor(cfg=small, score_type="REBA",
                       detector=StubDetector(), visualize=False)
    ref = single(synthetic_video, info_path, str(tmp_path / "single"))

    for name, par in (("tp", {"model": 4, "num_devices": 2}),
                      ("ep", {"expert": 4, "num_devices": 2})):
        cfg = small.replace(PARALLEL=par)
        pred = Predictor(cfg=cfg, score_type="REBA",
                         detector=StubDetector(), visualize=False)
        assert pred.pose_estimator.mesh is not None, name
        out = pred(synthetic_video, info_path, str(tmp_path / name))
        assert out["REBA"][0] == ref["REBA"][0], name


class _TwoPersonDetector:
    """Two deterministic content-derived boxes: bright pixels in the left
    and right frame halves (stable across any call batching)."""

    def __call__(self, frames_rgb):
        out = []
        for f in np.asarray(frames_rgb):
            w = f.shape[1]
            dets = []
            for x0, x1 in ((0, w // 2), (w // 2, w)):
                ys, xs = np.nonzero(f[:, x0:x1, 0] > 100)
                if len(xs) > 10:
                    dets.append([xs.min() + x0, ys.min(),
                                 xs.max() + x0, ys.max(), 0.9])
            out.append(np.asarray(dets, np.float32).reshape(-1, 5))
        return out


def test_multi_person_person_genders(tmp_path):
    """--person_genders end-to-end: in --multi_person mode each track is
    scored with ITS SMPL gender (estimator.set_gender between tracks), and
    each person's result equals a single-person run of that gender on a
    clip containing only them. The same run under PARALLEL.expert routes
    through the sharded gender tables and must agree."""
    import cv2

    from poserisk_release_tpu.io.video import write_video

    def clip(path, left=True, right=True):
        frames = []
        for i in range(24):
            img = np.full((120, 200, 3), 25, np.uint8)
            if left:
                cv2.rectangle(img, (15 + i // 4, 25), (65 + i // 4, 105),
                              (190, 160, 140), -1)
            if right:
                cv2.rectangle(img, (130, 20 + i // 6), (185, 100 + i // 6),
                              (190, 160, 140), -1)
            frames.append(img)
        write_video(frames, fps=10.0, file_path=str(path))
        return str(path)

    both = clip(tmp_path / "both.mp4")
    small = default_config().replace(
        MODEL={"input_shape": (64, 64)}, PARALLEL={"frames_per_step": 8})
    genders = {1: "male", 2: "female"}

    pred = Predictor(cfg=small, score_type="REBA", multi_person=True,
                     person_genders=genders, detector=_TwoPersonDetector(),
                     visualize=False)
    combined = pred(both, "/nonexistent.json", str(tmp_path / "combined"))
    assert set(combined) == {1, 2}
    # The run leaves the estimator back on the run-level gender.
    assert pred.pose_estimator.gender == "neutral"

    solo = {}
    for pid, (only_left, g) in {1: (True, "male"),
                                2: (False, "female")}.items():
        solo_clip = clip(tmp_path / f"solo{pid}.mp4",
                         left=only_left, right=not only_left)
        p = Predictor(cfg=small, score_type="REBA", gender=g,
                      detector=_TwoPersonDetector(), visualize=False)
        solo[pid] = p(solo_clip, "/nonexistent.json",
                      str(tmp_path / f"solo{pid}"))
        assert combined[pid]["REBA"][0] == solo[pid]["REBA"][0], pid

    ep_pred = Predictor(
        cfg=small.replace(PARALLEL={"expert": 4, "num_devices": 2}),
        score_type="REBA", multi_person=True, person_genders=genders,
        detector=_TwoPersonDetector(), visualize=False)
    ep = ep_pred(both, "/nonexistent.json", str(tmp_path / "ep"))
    for pid in (1, 2):
        assert ep[pid]["REBA"][0] == combined[pid]["REBA"][0], pid


def test_parse_person_genders_cli():
    from poserisk_release_tpu.cli import parse_person_genders

    assert parse_person_genders("") == {}
    assert parse_person_genders("1:male, 3: female") == {1: "male",
                                                         3: "female"}
    with pytest.raises(ValueError, match="person_genders"):
        parse_person_genders("male")
    with pytest.raises(ValueError, match="Invalid gender"):
        Predictor(cfg=_test_config(), detector=StubDetector(),
                  person_genders={1: "robot"})


def test_run_from_frames_device_source_matches_host(rng):
    """run_from_frames with a device-resident frames array (the streaming
    scorer's shared per-window union upload) must equal the host-ndarray
    run exactly -- including the device-side repeat-edge padding branch
    (13 frames force padding at frames_per_step=4) and mesh sharding."""
    import jax.numpy as jnp

    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg = default_config().replace(PARALLEL={"frames_per_step": 4})
    family = SMPLFamily(cfg.SPIN.smpl_model_dir)
    frames = rng.randint(0, 256, (16, 60, 80, 3)).astype(np.uint8)
    ids = np.arange(3, 16)  # 13 tracked frames: not a chunk multiple
    boxes = np.tile(np.array([40.0, 30.0, 24.0, 40.0], np.float32), (13, 1))

    est = PoseEstimator(cfg, family)
    e_host, jc_host, _ = est.run_from_frames(frames, ids, boxes)
    e_dev, jc_dev, _ = est.run_from_frames(jnp.asarray(frames), ids, boxes)
    np.testing.assert_array_equal(e_host, e_dev)
    np.testing.assert_array_equal(jc_host, jc_dev)

    # A mesh instance compiles a DIFFERENT executable (sharded lowering), so
    # cross-run agreement is the documented last-ulp compile class
    # (docs/PARITY.md #5b qualifier), not bit-exactness.
    est_mesh = PoseEstimator(cfg, family, mesh=make_mesh(8))
    e_mesh, jc_mesh, _ = est_mesh.run_from_frames(jnp.asarray(frames), ids, boxes)
    np.testing.assert_allclose(e_host, e_mesh, atol=2e-3)
    np.testing.assert_allclose(jc_host, jc_mesh, atol=2e-3)


def test_windowed_int8_detector_calibrates_before_tracking(synthetic_video,
                                                           info_path, tmp_path):
    """Predictor + int8 YoloDetector + windows smaller than the clip: the
    detector must be calibrated (quantized) up front from the first decoded
    window -- not left to the implicit first-call lifecycle, which under
    windowed ingest would pin scales after window 1 AND detect that window
    with the float graph (inconsistent within one video)."""
    from poserisk_release_tpu.models.detector import (
        YoloDetector, fold_bn_params, init_yolo_params,
    )

    det = YoloDetector(
        params=fold_bn_params(init_yolo_params()),
        img_size=64, int8=True, rect=True, batch_size=8,
        detection_threshold=0.999999,  # random weights: keep dets sparse
    )
    assert det.needs_calibration
    cfg = _test_config().replace(DETECTOR={"batch_size": 8})
    predictor = Predictor(cfg=cfg, score_type="REBA", detector=det,
                          visualize=False)
    try:
        predictor(synthetic_video, info_path, str(tmp_path / "out"))
    except ValueError as exc:
        # random-weight detections at this threshold may leave no usable
        # track; the lifecycle assertion below is the point of the test
        assert "track" in str(exc) or "person" in str(exc)
    assert not det.needs_calibration  # quantized during the run
    assert any("qkernel" in l for l in det.params.values())


def test_debug_frame_not_in_track_raises_clearly():
    """--debug_frame on a frame the selected track never covers must raise a
    clear ValueError, not IndexError from an empty np.where."""
    import numpy as np
    import pytest

    from poserisk_release_tpu.pipeline import Predictor

    p = Predictor.__new__(Predictor)  # guard fires before any other attr
    p.debug_frame = 100
    with pytest.raises(ValueError, match="--debug_frame 100"):
        p._visualize_joint_cam_mesh(None, None, np.array([1, 2, 3]), "/tmp")
