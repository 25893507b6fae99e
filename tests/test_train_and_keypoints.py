"""Tests: training-support components and the keypoint bbox path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poserisk_release_tpu.io import keypoints as kp
from poserisk_release_tpu.train import datasets as ds
from poserisk_release_tpu.train import losses, optim


# ---------------------------------------------------------------------------
# Keypoint bbox path
# ---------------------------------------------------------------------------
class TestKeypoints:
    def _kps(self, cx, cy, h):
        """A 5-point person spanning `h` pixels vertically, fully visible."""
        pts = np.array(
            [
                [cx, cy - h / 2, 1.0],
                [cx - h / 8, cy, 1.0],
                [cx + h / 8, cy, 1.0],
                [cx, cy + h / 2, 1.0],
                [cx, cy, 1.0],
            ]
        )
        return pts

    def test_bbox_param_scale(self):
        p = kp.kp_to_bbox_param(self._kps(100, 80, 150), vis_thresh=0.3)
        np.testing.assert_allclose(p[:2], [100, 80], atol=1e-6)
        # person "height" is the min-max diagonal norm: hypot(h/4, h)
        diag = np.hypot(150 / 4, 150)
        np.testing.assert_allclose(p[2], 150.0 / diag, atol=1e-6)

    def test_invisible_returns_none(self):
        pts = self._kps(0, 0, 100)
        pts[:, 2] = 0.0
        assert kp.kp_to_bbox_param(pts, vis_thresh=0.3) is None
        assert kp.kp_to_bbox_param(None, vis_thresh=0.3) is None

    def test_gap_interpolation(self):
        seq = [self._kps(0, 0, 150), None, None, self._kps(30, 0, 150)]
        params, start, end = kp.get_all_bbox_params(seq, vis_thresh=0.3)
        assert (start, end) == (0, 4)
        np.testing.assert_allclose(params[:, 0], [0, 10, 20, 30], atol=1e-4)

    def test_leading_trailing_missing_trimmed(self):
        seq = [None, self._kps(5, 5, 150), self._kps(6, 5, 150), None]
        params, start, end = kp.get_all_bbox_params(seq, vis_thresh=0.3)
        assert (start, end) == (1, 3)
        assert params.shape == (2, 3)

    def test_bboxes_from_joints2d_square_person_height(self):
        seq = [self._kps(100, 80, 200)] * 13
        bboxes, t0, t1 = kp.bboxes_from_joints2d(seq, vis_thresh=0.3)
        assert (t0, t1) == (0, 13)
        diag = np.hypot(200 / 4, 200)  # person extent = min-max diagonal
        np.testing.assert_allclose(bboxes[:, 2], diag, atol=1e-2)
        np.testing.assert_allclose(bboxes[:, 3], diag, atol=1e-2)

    def test_smoothing_shapes(self):
        seq = [self._kps(10 * i, 0, 150 + (i % 3)) for i in range(20)]
        smoothed, start, end = kp.get_smooth_bbox_params(seq, vis_thresh=0.3)
        assert smoothed.shape == (20, 3)
        assert (start, end) == (0, 20)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def mesh_fixture(rng):
    verts = rng.normal(size=(2, 30, 3)).astype(np.float32)
    target = verts + rng.normal(scale=0.01, size=verts.shape).astype(np.float32)
    faces = np.stack(
        [np.arange(28), np.arange(1, 29), np.arange(2, 30)], axis=1
    ).astype(np.int32)
    return verts, target, faces


class TestLosses:
    def test_coord_loss_masked(self, rng):
        pred = rng.normal(size=(4, 10, 3))
        target = rng.normal(size=(4, 10, 3))
        valid = (rng.rand(4, 10, 1) > 0.5).astype(np.float64)
        got = float(losses.coord_loss(pred, target, valid))
        want = np.abs(pred * valid - target * valid).mean()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_laplacian_matches_dense_reference(self, mesh_fixture):
        verts, _, faces = mesh_fixture
        nv = verts.shape[1]
        # Dense reference construction (loss.py:31-44).
        lap = np.zeros((nv, nv), np.float32)
        for a, b, c in faces:
            for u, v in ((a, b), (b, c), (c, a)):
                lap[u, v] = -1
                lap[v, u] = -1
        r, c = np.diag_indices(nv)
        lap[r, c] = -lap.sum(1)
        for i in range(nv):
            lap[i, :] /= lap[i, i] + 1e-8
        want = np.mean(
            np.sum(np.einsum("vw,bwc->bvc", lap, verts) ** 2, axis=2)
        )

        table, mask, _deg = losses.build_laplacian_neighbors(faces, nv)
        got = float(losses.laplacian_loss(jnp.asarray(verts), table, mask))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_normal_and_edge_losses(self, mesh_fixture):
        verts, target, faces = mesh_fixture
        n = float(losses.normal_vector_loss(jnp.asarray(verts), jnp.asarray(target), faces))
        e = float(losses.edge_length_loss(jnp.asarray(verts), jnp.asarray(target), faces))
        assert 0 <= n <= 1
        assert e >= 0
        # identical meshes: edge loss 0; normals orthogonal to themselves -> 0
        e0 = float(losses.edge_length_loss(jnp.asarray(verts), jnp.asarray(verts), faces))
        np.testing.assert_allclose(e0, 0, atol=1e-6)

    def test_losses_are_differentiable(self, mesh_fixture):
        verts, target, faces = mesh_fixture
        table, mask, _ = losses.build_laplacian_neighbors(faces, verts.shape[1])

        def total(v):
            return (
                losses.coord_loss(v, target)
                + losses.laplacian_loss(v, table, mask)
                + losses.normal_vector_loss(v, jnp.asarray(target), faces)
                + losses.edge_length_loss(v, jnp.asarray(target), faces)
            )

        grad = jax.grad(total)(jnp.asarray(verts))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0

    def test_get_loss_factory(self, mesh_fixture):
        _, _, faces = mesh_fixture
        loss_tuple = losses.get_loss(faces)
        assert len(loss_tuple) == 5


# ---------------------------------------------------------------------------
# Optimizers / checkpoints
# ---------------------------------------------------------------------------
class TestOptim:
    @pytest.mark.parametrize("name", ["sgd", "rmsprop", "adam", "adamw"])
    def test_optimizer_reduces_quadratic(self, name):
        opt = optim.get_optimizer(name, lr=0.1)
        params = {"w": jnp.asarray([3.0, -2.0])}
        state = opt.init(params)

        def loss_fn(p):
            return jnp.sum(p["w"] ** 2)

        for _ in range(50):
            grads = jax.grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert float(loss_fn(params)) < float(jnp.sum(jnp.asarray([3.0, -2.0]) ** 2))

    def test_unknown_optimizer(self):
        with pytest.raises(ValueError):
            optim.get_optimizer("lion", lr=0.1)

    def test_step_schedule(self):
        sched = optim.step_schedule(1.0, milestones=[10, 20], gamma=0.1)
        assert float(sched(5)) == pytest.approx(1.0)
        assert float(sched(15)) == pytest.approx(0.1)
        assert float(sched(25)) == pytest.approx(0.01)

    def test_plateau_scheduler(self):
        sched = optim.PlateauScheduler(lr=1.0, factor=0.5, patience=1)
        for metric in [1.0, 0.9, 0.95, 0.95, 0.95]:
            lr = sched.step(metric)
        assert lr == 0.5

    def test_get_scheduler_factory(self):
        """funcs_utils.py:181-189 parity: 'step'/'platue' (the reference's
        spelling)/fall-through None, with the hardwired plateau params."""
        sched = optim.get_scheduler("step", 1.0, milestones=[10], gamma=0.1)
        assert float(sched(5)) == pytest.approx(1.0)
        assert float(sched(15)) == pytest.approx(0.1)

        plateau = optim.get_scheduler("platue", 2.0, gamma=0.5)
        assert isinstance(plateau, optim.PlateauScheduler)
        assert (plateau.lr, plateau.factor, plateau.patience, plateau.min_lr) == (
            2.0, 0.5, 10, 1e-5,
        )
        assert optim.get_scheduler("cosine", 1.0) is None
        assert optim.get_scheduler(None, 1.0) is None

    def test_lr_check_prints_and_returns(self, capsys):
        """funcs_utils.py:96-104 parity: reports the current lr (warmup is
        dead code in the reference and performs none here)."""
        assert optim.lr_check(0.125, epoch=3) == 0.125
        assert "Current epoch 3, lr: 0.125" in capsys.readouterr().out

        sched = optim.step_schedule(1.0, milestones=[2], gamma=0.1)
        got = optim.lr_check(sched, epoch=5)
        assert got == pytest.approx(0.1)
        assert "Current epoch 5" in capsys.readouterr().out

    def test_checkpoint_roundtrip(self, tmp_path):
        state = {"params": {"layer": {"kernel": np.arange(6.0).reshape(2, 3)}},
                 "opt": {"count": np.asarray(7)}}
        path = optim.save_checkpoint(state, epoch=3, checkpoint_dir=str(tmp_path))
        assert path.endswith("epoch_3.npz")
        loaded = optim.load_checkpoint(path)
        np.testing.assert_allclose(
            loaded["params"]["layer"]["kernel"], state["params"]["layer"]["kernel"]
        )

        final = optim.save_checkpoint(state, epoch=5, checkpoint_dir=str(tmp_path), end_epoch=5)
        assert final.endswith("final.npz")

    def test_checkpoint_missing(self):
        with pytest.raises(ValueError, match="No checkpoint exists"):
            optim.load_checkpoint("/nonexistent/ckpt.npz")


# ---------------------------------------------------------------------------
# Dataset composition
# ---------------------------------------------------------------------------
class TestDatasets:
    def test_multiple_datasets_same_len(self):
        a = list(range(10))
        b = list(range(100, 103))
        mix = ds.MultipleDatasets([a, b], make_same_len=True, seed=0)
        assert len(mix) == 20
        vals = [mix[i] for i in range(len(mix))]
        assert any(v >= 100 for v in vals) and any(v < 100 for v in vals)

    def test_multiple_datasets_concat(self):
        a = list(range(3))
        b = list(range(100, 102))
        mix = ds.MultipleDatasets([a, b], make_same_len=False)
        assert len(mix) == 5
        assert [mix[i] for i in range(5)] == [0, 1, 2, 100, 101]

    def test_sequence_windows_reference_shape(self):
        windows = ds.sequence_windows(num_items=20, seq_len=16)
        # reference: (N - L + 1) sliding + L/2 leading + (L/2 - 1) trailing
        assert len(windows) == (20 - 16 + 1) + 8 + 7
        assert windows[0] == (0, 0)  # replicated edges
        assert windows[8] == (0, 15)  # first true window

    def test_gather_window(self, rng):
        feats = rng.normal(size=(20, 4))
        full = ds.gather_window(feats, (2, 17), 16)
        assert full.shape == (16, 4)
        edge = ds.gather_window(feats, (3, 3), 16)
        assert edge.shape == (16, 4)
        assert (edge == feats[3]).all()

    def test_split_into_chunks_plain(self):
        """stride == seqlen: plain non-overlapping windows, no dummies."""
        vids = np.array(["a"] * 10 + ["b"] * 4 + ["c"] * 2)
        chunks = ds.split_into_chunks(vids, seqlen=4, stride=4)
        assert chunks == [[0, 3], [4, 7], [10, 13]]  # video c too short

    def test_split_into_chunks_train_dummies(self):
        """stride != seqlen, is_train: seqlen/2 front copies of the first
        window + ceil(seqlen/2)-1 tail copies of the last, per video
        (_img_utils.py:360-372 arithmetic)."""
        vids = np.array(["a"] * 10 + ["b"] * 4 + ["c"] * 2)
        chunks = ds.split_into_chunks(vids, seqlen=4, stride=2)
        assert chunks == (
            [[0, 3], [0, 3], [0, 3], [2, 5], [4, 7], [6, 9], [6, 9]]
            + [[10, 13]] * 4
        )

    def test_split_into_chunks_eval_edge_markers(self):
        """is_train=False: single-frame [d+j, d+j] edge markers instead of
        window copies, offsets from the reference's captured d values."""
        vids = np.array(["a"] * 10)
        chunks = ds.split_into_chunks(vids, seqlen=4, stride=2,
                                      is_train=False)
        assert chunks == [[0, 0], [1, 1],
                          [0, 3], [2, 5], [4, 7], [6, 9], [9, 9]]

    def test_split_into_chunks_match_vibe_trim(self):
        """Videos >= 16 frames: trailing windows past the last COMPLETE
        16-step window's end are trimmed (VIBE alignment,
        _img_utils.py:352-358)."""
        vids = np.array(["d"] * 18)
        chunks = ds.split_into_chunks(vids, seqlen=4, stride=2)
        # untrimmed ends would run ... 15, 17; vibe end = index 15
        real = [c for c in chunks if c[1] - c[0] == 3]
        assert real[-1] == [12, 15] and not any(c[1] == 17 for c in chunks)
        no_trim = ds.split_into_chunks(vids, seqlen=4, stride=2,
                                       match_vibe=False)
        assert any(c[1] == 17 for c in no_trim)

    def test_batch_iterator(self, rng):
        data = [np.full((2,), i) for i in range(7)]
        batches = list(ds.BatchIterator(data, batch_size=3))
        assert [b.shape[0] for b in batches] == [3, 3, 1]
        batches = list(ds.BatchIterator(data, batch_size=3, drop_last=True))
        assert [b.shape[0] for b in batches] == [3, 3]


# ---------------------------------------------------------------------------
# Training-preprocessing keypoint utilities (reference _img_utils.py)
# ---------------------------------------------------------------------------
class TestKeypointPreprocessing:
    def test_get_bbox_from_kp2d_single(self):
        pts = np.array([[10.0, 20.0], [50.0, 100.0], [30.0, 60.0]])
        cx, cy, w, h = kp.get_bbox_from_kp2d(pts)
        assert cx == 30.0 and cy == 60.0
        # taller than wide -> side = height * 1.1
        assert w == h == pytest.approx(80.0 * 1.1)

    def test_get_bbox_from_kp2d_wide_person_quirk(self):
        """Reference parity: np.where(w/h > 1, w, h) picks the WIDTH when the
        extent is wider than tall (then scales by 1.1)."""
        pts = np.array([[0.0, 0.0], [100.0, 10.0]])
        _, _, w, h = kp.get_bbox_from_kp2d(pts)
        assert w == h == pytest.approx(100.0 * 1.1)

    def test_get_bbox_from_kp2d_batched_layout(self):
        pts = np.stack([np.array([[10.0, 20.0], [50.0, 100.0]])] * 3)
        bbox = kp.get_bbox_from_kp2d(pts)
        assert bbox.shape == (4, 3)  # the reference's transposed (4, N)
        np.testing.assert_allclose(bbox[0], 30.0)

    def test_normalize_2d_kp_roundtrip(self):
        pts = np.array([[0.0, 112.0], [224.0, 56.0]])
        n = kp.normalize_2d_kp(pts, crop_size=224)
        assert n.min() >= -1.0 and n.max() <= 1.0
        np.testing.assert_allclose(kp.normalize_2d_kp(n, 224, inv=True), pts)
        np.testing.assert_allclose(kp.normalize_2d_kp(np.zeros((1, 2)), 224), -1.0)

    def test_transform_keypoints_matches_cv2_oracle(self):
        """Closed-form affine == cv2.getAffineTransform on the reference's
        three control points (gen_trans_from_patch_cv, _img_utils.py:53-85)."""
        import cv2

        cx, cy, w, h, scale, rot = 77.0, 51.0, 60.0, 80.0, 1.2, 25.0
        out_w = out_h = 224
        rot_rad = np.pi * rot / 180

        def rot2d(pt, r):
            sn, cs = np.sin(r), np.cos(r)
            return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], np.float32)

        src_down = rot2d(np.array([0, h * scale * 0.5], np.float32), rot_rad)
        src_right = rot2d(np.array([w * scale * 0.5, 0], np.float32), rot_rad)
        src = np.stack([
            np.array([cx, cy], np.float32),
            np.array([cx, cy], np.float32) + src_down,
            np.array([cx, cy], np.float32) + src_right,
        ])
        dst = np.stack([
            np.array([out_w * 0.5, out_h * 0.5], np.float32),
            np.array([out_w * 0.5, out_h], np.float32),
            np.array([out_w, out_h * 0.5], np.float32),
        ])
        trans = cv2.getAffineTransform(src, dst)

        pts = np.array([[60.0, 40.0], [90.0, 80.0], [77.0, 51.0]])
        want = (trans @ np.concatenate([pts, np.ones((3, 1))], axis=1).T).T
        got = kp.transform_keypoints(pts, cx, cy, w, h, out_w, out_h, scale, rot)
        np.testing.assert_allclose(got, want, atol=1e-3)
        # typo'd reference alias resolves to the same function
        assert kp.transfrom_keypoints is kp.transform_keypoints


# ---------------------------------------------------------------------------
# Training plots (train/plots.py vs funcs_utils.py:211-231, vis_utils.py:247-276)
# ---------------------------------------------------------------------------
class TestTrainingPlots:
    def test_save_plot_writes_reference_named_pdf(self, tmp_path):
        from poserisk_release_tpu.train.plots import save_plot

        out = save_plot([3.0, 2.0, 1.5, 1.8], epoch=4, graph_dir=str(tmp_path))
        assert out.endswith("train_loss.pdf")  # file name from the BARE title
        import os.path as osp

        assert osp.isfile(out) and osp.getsize(out) > 0

    def test_plot_joint_error_pads_angle_series(self, tmp_path):
        from poserisk_release_tpu.train.plots import plot_joint_error

        mpjpe = np.linspace(40, 20, 60)
        mpjve = np.linspace(5, 2, 60)
        mpjae = np.linspace(9, 4, 59)  # one shorter; zero-padded like the ref
        p1, p2 = plot_joint_error(mpjpe, mpjve, mpjae, str(tmp_path))
        assert p1.endswith("mpjpe.jpg") and p2.endswith("mpjve_&_mpjae.jpg")
        import os.path as osp

        assert osp.isfile(p1) and osp.isfile(p2)
