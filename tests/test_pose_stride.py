"""Pose-stride throughput mode: slerp interpolation, anchor exactness, wiring.

The mode (SpinConfig.pose_stride / --pose_stride / BENCH_POSE_STRIDE) runs
crop+SPIN only on every Nth tracked frame and slerp-interpolates the skipped
frames' joint rotations on device (throughput.make_pose_core); scoring still
covers every frame. It is the SPIN-stage counterpart of the detection stride
(DetectorConfig.detection_stride) -- an opt-in deviation from the reference's
pose-every-frame contract (/root/reference/lib/core/base.py:211-240), bounds
documented in docs/PARITY.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _rand_rotmats(rng, shape):
    from scipy.spatial.transform import Rotation

    n = int(np.prod(shape))
    return Rotation.random(n, random_state=rng).as_matrix().reshape(*shape, 3, 3)


class TestSlerpRotmat:
    def test_matches_scipy_slerp(self):
        from scipy.spatial.transform import Rotation, Slerp

        from poserisk_release_tpu.ops.rotations import slerp_rotmat

        rng = np.random.RandomState(0)
        worst = 0.0
        for _ in range(50):
            ra = Rotation.random(random_state=rng)
            rb = Rotation.random(random_state=rng)
            t = float(rng.rand())
            want = Slerp([0, 1], Rotation.concatenate([ra, rb]))([t])[0].as_matrix()
            got = np.asarray(
                slerp_rotmat(jnp.asarray(ra.as_matrix(), jnp.float32),
                             jnp.asarray(rb.as_matrix(), jnp.float32),
                             jnp.float32(t)))
            worst = max(worst, float(np.abs(got - want).max()))
        assert worst < 1e-4

    def test_t_zero_is_bit_exact(self):
        """Anchors sit at t == 0 in the pose-stride expansion; their poses
        must never be perturbed by the interpolation math."""
        from poserisk_release_tpu.ops.rotations import slerp_rotmat

        rng = np.random.RandomState(1)
        Ra = jnp.asarray(_rand_rotmats(rng, (6,)), jnp.float32)
        Rb = jnp.asarray(_rand_rotmats(rng, (6,)), jnp.float32)
        out = slerp_rotmat(Ra, Rb, jnp.zeros((6, 1, 1), jnp.float32))
        assert bool((out == Ra).all())

    def test_t_one_reaches_endpoint(self):
        from poserisk_release_tpu.ops.rotations import slerp_rotmat

        rng = np.random.RandomState(2)
        Ra = jnp.asarray(_rand_rotmats(rng, (6,)), jnp.float32)
        Rb = jnp.asarray(_rand_rotmats(rng, (6,)), jnp.float32)
        out = slerp_rotmat(Ra, Rb, jnp.ones((6, 1, 1), jnp.float32))
        assert float(jnp.abs(out - Rb).max()) < 1e-5

    def test_near_pi_relative_rotation(self):
        """The relative rotation's theta ~ pi branch (rotmat_to_axis_angle's
        cv2 diagonal method) must stay stable inside the slerp."""
        from scipy.spatial.transform import Rotation, Slerp

        from poserisk_release_tpu.ops.rotations import slerp_rotmat

        ra = Rotation.identity()
        rb = Rotation.from_rotvec([np.pi - 1e-4, 0.0, 0.0])
        want = Slerp([0, 1], Rotation.concatenate([ra, rb]))([0.5])[0].as_matrix()
        got = np.asarray(
            slerp_rotmat(jnp.asarray(ra.as_matrix(), jnp.float32),
                         jnp.asarray(rb.as_matrix(), jnp.float32),
                         jnp.float32(0.5)))
        assert np.abs(got - want).max() < 1e-3


@pytest.fixture(scope="module")
def pose_fixture():
    from poserisk_release_tpu.body.smpl import SMPLFamily
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.pipeline import PoseEstimator
    from poserisk_release_tpu.throughput import default_packed_infos

    cfg = default_config().replace(PARALLEL={"frames_per_step": 16})
    family = SMPLFamily(cfg.SPIN.smpl_model_dir)
    est = PoseEstimator(cfg, family)
    ir, iu = default_packed_infos()
    return cfg, family, est, jnp.asarray(ir), jnp.asarray(iu)


class TestPoseStrideStep:
    def test_static_clip_scores_identical_to_stride_one(self, pose_fixture):
        """Identical crops on every frame -> identical rotmats at both
        anchors -> the slerp is exact -> every output matches stride 1."""
        from poserisk_release_tpu.throughput import make_pose_and_score_step

        cfg, _family, est, ir, iu = pose_fixture
        rng = np.random.RandomState(0)
        crop = jnp.asarray(rng.rand(1, 224, 224, 3), jnp.float32)
        static = jnp.broadcast_to(crop, (8, 224, 224, 3))
        s1 = make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents)
        s4 = make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents,
                                      pose_stride=4)
        r1 = s1(est.variables, est.smpl_params, static, ir, iu)
        r4 = s4(est.variables, est.smpl_params, static[::4], ir, iu)
        assert bool((r1[0] == r4[0]).all()) and bool((r1[1] == r4[1]).all())
        assert float(jnp.abs(r1[2] - r4[2]).max()) < 1e-3  # euler deg

    def test_anchor_frames_bit_exact(self, pose_fixture):
        """Every pose_stride-th output must equal a stride-1 run on the same
        anchor batch BIT-EXACTLY (t == 0 never perturbs anchors)."""
        from poserisk_release_tpu.throughput import make_pose_and_score_step

        cfg, _family, est, ir, iu = pose_fixture
        rng = np.random.RandomState(1)
        anchors = jnp.asarray(rng.rand(3, 224, 224, 3), jnp.float32)
        s1 = make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents)
        s4 = make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents,
                                      pose_stride=4)
        r1 = s1(est.variables, est.smpl_params, anchors, ir, iu)
        r4 = s4(est.variables, est.smpl_params, anchors, ir, iu)
        assert r4[2].shape[0] == 12  # 3 anchors x stride 4
        assert bool((r4[2][::4] == r1[2]).all())  # euler
        assert bool((r4[0][::4] == r1[0]).all())  # reba

    def test_interpolated_rotations_lie_on_geodesic(self, pose_fixture):
        """The frames between two anchors must follow the constant-velocity
        geodesic: the relative rotation anchor->frame scales linearly."""
        from poserisk_release_tpu.ops.rotations import (
            axis_angle_to_rotmat,
            rotmat_to_axis_angle,
        )
        from poserisk_release_tpu.throughput import make_pose_core

        cfg, _family, est, _ir, _iu = pose_fixture
        rng = np.random.RandomState(2)
        anchors = jnp.asarray(rng.rand(2, 224, 224, 3), jnp.float32)
        core1 = make_pose_core(cfg.SPIN.ief_iters, est.parents)
        core4 = make_pose_core(cfg.SPIN.ief_iters, est.parents, pose_stride=4)
        # Recover the interpolated rotmats through the euler outputs is
        # lossy; instead rebuild from axis-angle outputs (root excluded --
        # it is forced to ROOT_POSE after interpolation, same as stride 1).
        _e1, _j1, aa1 = core1(est.variables, est.smpl_params, anchors)
        _e4, _j4, aa4 = core4(est.variables, est.smpl_params, anchors)
        Ra = axis_angle_to_rotmat(aa1[0, 1:])   # joints 1.. of anchor 0
        Rb = axis_angle_to_rotmat(aa1[1, 1:])
        rel = jnp.swapaxes(Ra, -1, -2) @ Rb
        aa_rel = rotmat_to_axis_angle(rel)
        for k in range(1, 4):
            want = Ra @ axis_angle_to_rotmat(aa_rel * (k / 4.0))
            got = axis_angle_to_rotmat(aa4[k, 1:])
            # f32 tolerance: the comparison stacks two log/exp round trips
            # (the core's slerp and this restatement), each ~1e-4 worst-case.
            assert float(jnp.abs(want - got).max()) < 5e-4, k

    def test_batch_not_multiple_raises_in_full_step(self, pose_fixture):
        from poserisk_release_tpu.throughput import make_full_frame_step

        cfg, _family, est, ir, iu = pose_fixture
        step = make_full_frame_step(cfg.SPIN.ief_iters, est.parents,
                                    img_size=64, pose_stride=4)
        from poserisk_release_tpu.models.detector import (
            fold_bn_params,
            init_yolo_params,
        )

        yolo = fold_bn_params(init_yolo_params())
        frames = jnp.zeros((6, 64, 64, 3), jnp.uint8)
        boxes = jnp.tile(jnp.asarray([32.0, 32.0, 20.0, 20.0]), (6, 1))
        with pytest.raises(ValueError, match="multiple of"):
            step(yolo, est.variables, est.smpl_params, frames, boxes, ir, iu)

    def test_full_step_stride_composition_shapes(self, pose_fixture):
        """det_stride and pose_stride compose: det_best keeps its
        ceil(B/det_stride) shape, scores keep the full batch shape, for
        both the unfused and the fused (interpret-mode) resample paths,
        which must also agree with each other (same f32 crops/letterbox
        to rounding -> same SPIN -> same integer scores)."""
        from poserisk_release_tpu.models.detector import (
            fold_bn_params,
            init_yolo_params,
        )
        from poserisk_release_tpu.throughput import make_full_frame_step

        cfg, _family, est, ir, iu = pose_fixture
        yolo = fold_bn_params(init_yolo_params())
        rng = np.random.RandomState(3)
        frames = jnp.asarray(rng.randint(0, 256, (8, 64, 64, 3)), jnp.uint8)
        boxes = jnp.tile(jnp.asarray([32.0, 32.0, 20.0, 20.0]), (8, 1))
        for det_s, pose_s in [(1, 2), (4, 2), (2, 4), (4, 4)]:
            step = make_full_frame_step(
                cfg.SPIN.ief_iters, est.parents, img_size=64,
                det_stride=det_s, pose_stride=pose_s)
            reba, rula, det_best = step(
                yolo, est.variables, est.smpl_params, frames, boxes, ir, iu)
            assert reba.shape == (8,) and rula.shape == (8,), (det_s, pose_s)
            assert det_best.shape == (-(-8 // det_s),), (det_s, pose_s)
            # The fused branch's gcd composition (kernel det_stride//g,
            # crop_stride//g, frame_stride=g) must reproduce the unfused
            # slices: same shapes, near-identical detector scores.
            fused = make_full_frame_step(
                cfg.SPIN.ief_iters, est.parents, img_size=64,
                det_stride=det_s, pose_stride=pose_s,
                fused_resample=True, fused_interpret=True)
            f_reba, f_rula, f_best = fused(
                yolo, est.variables, est.smpl_params, frames, boxes, ir, iu)
            assert f_reba.shape == (8,) and f_best.shape == det_best.shape
            assert float(jnp.abs(f_best - det_best).max()) < 1e-3, \
                (det_s, pose_s)


class TestFusedKernelFrameStride:
    def test_frame_stride_matches_jnp_pair(self):
        """fused kernel with frame_stride g, det_stride d, crop_stride p
        must equal letterbox_device_rect(frames[::g*d]) +
        crop_batch(frames[::g*p])."""
        from poserisk_release_tpu.ops.crop import crop_batch, letterbox_device_rect
        from poserisk_release_tpu.ops.resample_pallas import fused_letterbox_crop

        rng = np.random.RandomState(0)
        B = 16
        frames = jnp.asarray(rng.randint(0, 256, (B, 96, 160, 3)), jnp.uint8)
        boxes = jnp.asarray(
            np.stack([np.full(B, 80.0), np.full(B, 48.0),
                      rng.uniform(30, 60, B), rng.uniform(40, 80, B)], 1),
            jnp.float32)
        for g, d, p in [(2, 2, 1), (4, 1, 1), (2, 1, 2), (1, 4, 1),
                        (1, 1, 8), (1, 2, 4), (2, 4, 1)]:
            letter, crops = fused_letterbox_crop(
                frames, boxes, img_size=64, compute_dtype=jnp.float32,
                interpret=True, det_stride=d, frame_stride=g, crop_stride=p)
            ref_l = letterbox_device_rect(frames[:: g * d], 64,
                                          compute_dtype=jnp.float32)
            ref_c = crop_batch(frames[:: g * p], boxes[:: g * p], scale=1.2,
                               out_size=224, compute_dtype=jnp.float32)
            assert letter.shape == ref_l.shape and crops.shape == ref_c.shape
            assert float(jnp.abs(letter - ref_l).max()) < 1e-5, (g, d, p)
            assert float(jnp.abs(crops - ref_c).max()) < 1e-5, (g, d, p)


class TestPoseEstimatorStride:
    def test_estimator_outputs_every_frame(self, pose_fixture):
        """cfg-driven stride through the chunked product path: full-length
        outputs, bit-exact anchors, exactness on a static clip -- across a
        chunk boundary and with gappy frame ids."""
        from poserisk_release_tpu.pipeline import PoseEstimator

        cfg, family, est1, _ir, _iu = pose_fixture
        cfgS = cfg.replace(SPIN={"pose_stride": 4})
        estS = PoseEstimator(cfgS, family, variables=est1.variables)

        rng = np.random.RandomState(0)
        frames = rng.randint(0, 256, (60, 96, 160, 3)).astype(np.uint8)
        ids = np.sort(rng.choice(60, 37, replace=False))  # gappy, > chunk 16
        boxes = np.stack(
            [np.full(37, 80.0), np.full(37, 48.0),
             rng.uniform(30, 60, 37), rng.uniform(40, 80, 37)], 1
        ).astype(np.float32)

        e1, j1, a1 = est1.run_from_frames(frames, ids, boxes)
        eS, jS, aS = estS.run_from_frames(frames, ids, boxes)
        assert eS.shape == e1.shape == (37, 24, 3)
        assert jS.shape == (37, 24, 3) and aS.shape == (37, 24, 3)
        # Anchor positions (every 4th tracked frame; chunk 16 is a stride
        # multiple so the phase holds across the chunk boundary).
        assert np.array_equal(e1[::4], eS[::4])

        static = np.broadcast_to(frames[:1], frames.shape).copy()
        sboxes = np.tile(boxes[:1], (37, 1))
        e1s, _, _ = est1.run_from_frames(static, ids, sboxes)
        eSs, _, _ = estS.run_from_frames(static, ids, sboxes)
        assert np.array_equal(e1s, eSs)

    def test_run_crops_path_strided(self, pose_fixture):
        from poserisk_release_tpu.pipeline import PoseEstimator

        cfg, family, est1, _ir, _iu = pose_fixture
        cfgS = cfg.replace(SPIN={"pose_stride": 2})
        estS = PoseEstimator(cfgS, family, variables=est1.variables)
        rng = np.random.RandomState(1)
        crops = rng.rand(11, 224, 224, 3).astype(np.float32)
        e1, _, _ = est1.run(crops)
        eS, _, _ = estS.run(crops)
        assert eS.shape == (11, 24, 3)
        assert np.array_equal(e1[::2], eS[::2])


class TestStreamingWithPoseStride:
    def test_streaming_scorer_runs_and_covers_every_frame(self, tmp_path):
        """The streaming scorer inherits pose_stride through PoseEstimator;
        the track accumulates into the batch chunk structure (streaming.
        _TrackChunkScorer -- bit-exact equality is proven in
        tests/test_streaming.py), and every tracked frame gets a score."""
        import cv2

        from poserisk_release_tpu.config import default_config
        from poserisk_release_tpu.io.video import write_video
        from poserisk_release_tpu.models.detector import StubDetector
        from poserisk_release_tpu.pipeline import load_add_info
        from poserisk_release_tpu.streaming import StreamingScorer

        path = str(tmp_path / "clip.mp4")
        rng = np.random.RandomState(7)
        frames = []
        for i in range(24):
            img = np.full((120, 160, 3), 30, np.uint8)
            cv2.rectangle(img, (10 + i, 20), (60 + i, 100), (200, 150, 100), -1)
            img += rng.randint(0, 8, img.shape).astype(np.uint8)
            frames.append(img)
        write_video(frames, fps=12.0, file_path=path)

        cfg = default_config().replace(PARALLEL={"frames_per_step": 8},
                                       SPIN={"pose_stride": 2})
        info = load_add_info(cfg, "missing.json")
        res = StreamingScorer(cfg=cfg, detector=StubDetector(), window=8)(
            path, info)
        assert len(res.reba_scores) == len(res.frames) > 0
        assert len(res.rula_scores) == len(res.frames)


class TestWiring:
    def test_config_validates(self):
        from poserisk_release_tpu.config import default_config

        with pytest.raises(ValueError, match="pose_stride"):
            default_config().replace(SPIN={"pose_stride": 0})

    def test_cli_flag_reaches_config(self):
        from poserisk_release_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["--pose_stride", "4", "--input", "x.mp4"])
        assert args.pose_stride == 4
