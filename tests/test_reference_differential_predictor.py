"""Differential tests wave 4: the literal model-driven Predictor runs E2E.

Waves 1-3 left exactly one executable remnant class restatement-backed: the
model-driven methods `Predictor.__init__` / `__call__` /
`get_pose_estimation_results` and the `lib/utils/smpl.py` wrapper's
`__init__` (docs/PARITY.md "Truth links"). They were classed image-blocked
("need the never-shipped weights"), but every blocker has a faithful
public-semantics substitute already proven elsewhere in this repo:

  * the SMPL pkls -> the SAME synthetic-asset pickles the converter tests
    use (tests/test_lbs.py::test_pkl_conversion_roundtrip), loaded by the
    LITERAL `ready_arguments` (serialization.py:1-39) under a numpy-backed
    chumpy shim (chumpy only wraps arrays there; `posemap('lrotmin')` takes
    its pure-numpy branch because our ch.array IS an ndarray subclass);
  * the SPIN checkpoint -> torch.save({'model': {}}) + strict=False
    (base.py:83-84 loads nothing, exactly like a key-mismatched real file);
  * the SPIN network (`models.hmr`) -> the release never ships this module
    at all (its import is unsatisfiable in ANY install), so a scripted
    torch module returning predetermined rotation matrices is injected.
    EVERYTHING the release ships then executes literally end-to-end.

Both sides consume identical pose numerics: the literal
`get_pose_estimation_results` chain (rot_to_angle -> euler -> mutating
get_joint_cam, coord_utils.py) is captured once and INJECTED into the
product's `PoseEstimator.run_from_frames`, so every artifact diff below is
a pure test of the surrounding machinery (tracking selection, crop-dataset
loop, scoring, post-processing, rendering, CSV/txt/obj writers, directory
lifecycle). The pose chain itself is diffed against the product's device
functions separately (test_pose_chain_consistency) within the documented
precision classes, and its component functions are already literal-diffed
in wave 1.

One shim with pixel consequences: cv2 5.x asserts CV_8U in putText, so the
literal `visualize_result` (float64 canvas, base.py:305) cannot run here at
all (executed pin: test_reference_differential_base.py::
test_visualize_result_literal_rejected_by_cv2). The shim routes each
putText through a uint8 round-trip of the canvas -- at draw time the canvas
holds only integer-valued pixels (zeros, prior text, no image yet), so this
equals cv2 4.x drawing up to the documented antialiasing LSB class, and it
is exactly how the product renderer (and its pixel-parity oracle) draw.

The reference tree is read-only spec input; nothing here mutates it.
"""

import json
import os
import os.path as osp
import pickle
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from tests.test_reference_differential import REFERENCE_ROOT

pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(
        not osp.isdir(osp.join(REFERENCE_ROOT, "lib")),
        reason="reference tree not present",
    ),
]

# Late-bound targets for the import-name shims (set per fixture/test).
_SPIN_FACTORY = [None]  # models.hmr(mean_params) -> torch module
_TRACKER_FN = [None]  # MPT(...)(image_folder) -> tracking dict


# --------------------------------------------------------------------------
# Shims: chumpy (numpy-backed), models.hmr / MPT dispatchers
# --------------------------------------------------------------------------
def _install_chumpy_shim():
    """Functional numpy-backed chumpy, sufficient for the LITERAL
    `ready_arguments` + `posemapper` (serialization.py:24-37): ch.array
    returns an ndarray SUBCLASS with chumpy's `.r` property, so every dot/
    vstack/index in ready_arguments is plain numpy and `lrotmin` takes its
    isinstance(p, np.ndarray) branch (posemapper.py:18-20) -- no chumpy
    graph semantics are ever exercised. Idempotent; re-installs over the
    inert pickle-only fake test_lbs.py builds (and survives its teardown
    deleting the module, since we re-check per call)."""
    existing = sys.modules.get("chumpy")
    if existing is not None and getattr(existing, "_poserisk_functional", False):
        return

    class _ChArray(np.ndarray):
        @property
        def r(self):
            return np.asarray(self)

    def _array(x):
        return np.asarray(x).view(_ChArray)

    ch = types.ModuleType("chumpy")
    ch._poserisk_functional = True
    ch.Ch = type("Ch", (), {})
    ch.array = _array
    ch.eye = lambda n: _array(np.eye(n))
    ch.vstack = lambda xs: _array(np.vstack([np.asarray(x) for x in xs]))
    ch.concatenate = lambda xs: _array(
        np.concatenate([np.asarray(x) for x in xs])
    )
    ch_ch = types.ModuleType("chumpy.ch")
    ch_ch.MatVecMult = lambda A, x: _array(A.dot(np.asarray(x).ravel()))
    ch_ch.Ch = ch.Ch
    ch.ch = ch_ch
    sys.modules["chumpy"] = ch
    sys.modules["chumpy.ch"] = ch_ch


def _install_live_shims():
    """Upgrade wave 3's import-name-only shims to FUNCTIONAL ones so the
    literal `Predictor.__init__` / `DataProcessing.__init__` can run:
    `models.hmr` dispatches to the current scripted SPIN factory and
    `multi_person_tracker.MPT` is constructible with the reference's kwargs
    (base.py:38-46) and callable on an image folder. Wave 3's tests never
    call either symbol, so overwriting is order-independent."""
    from tests.test_reference_differential_base import (
        _install_import_name_shims,
    )
    from tests.test_reference_differential_wave2 import (
        _install_easydict_shim,
        _install_torchvision_shim,
    )

    _install_torchvision_shim()
    _install_easydict_shim()
    _install_import_name_shims()

    def hmr(mean_params):
        return _SPIN_FACTORY[0](mean_params)

    class MPT:
        def __init__(self, **kwargs):
            self.kwargs = kwargs

        def __call__(self, image_folder):
            return _TRACKER_FN[0](image_folder)

    sys.modules["models"].hmr = hmr
    sys.modules["multi_person_tracker"].MPT = MPT


class _PutTextU8:
    """cv2-5 compat shim for the literal float64 canvas (see module
    docstring): route putText through a uint8 round-trip. Passes uint8
    canvases (the product renderer's) straight through."""

    def __init__(self, cv2):
        self.cv2 = cv2
        self.orig = cv2.putText

    def __enter__(self):
        orig = self.orig

        def putText(img, *a, **k):
            if isinstance(img, np.ndarray) and img.dtype == np.float64:
                tmp = img.astype(np.uint8)
                orig(tmp, *a, **k)
                img[:] = tmp
                return img
            return orig(img, *a, **k)

        self.cv2.putText = putText
        return self

    def __exit__(self, *exc):
        self.cv2.putText = self.orig


# --------------------------------------------------------------------------
# Synthetic assets
# --------------------------------------------------------------------------
def _write_smpl_pkls(model_dir):
    """SMPL_{NEUTRAL,MALE,FEMALE}.pkl from the shared synthetic arrays, in
    the on-disk schema the literal ready_arguments + SMPL_Layer.__init__
    consume (plain ndarrays + scipy-sparse J_regressor, like the converter
    fixture in tests/test_lbs.py)."""
    import scipy.sparse as sp

    from poserisk_release_tpu.body.smpl import synthetic_smpl_arrays

    arrays = synthetic_smpl_arrays()
    payload = {
        "v_template": arrays["v_template"],
        "shapedirs": arrays["shapedirs"],
        "posedirs": arrays["posedirs"],
        "J_regressor": sp.csc_matrix(arrays["J_regressor"]),
        "weights": arrays["weights"],
        "kintree_table": np.stack(
            [arrays["kintree_parents"], np.arange(24)]
        ),
        "f": arrays["faces"],
        "betas": arrays["betas"],
        "bs_type": "lrotmin",
    }
    os.makedirs(model_dir, exist_ok=True)
    for gender in ("NEUTRAL", "MALE", "FEMALE"):
        with open(osp.join(model_dir, f"SMPL_{gender}.pkl"), "wb") as f:
            pickle.dump(payload, f)
    return arrays


def _scripted_tracking(n_frames):
    """Two-person tracking dict in the MPT squared-cxcywh contract: person 4
    survives the min-frame filter (14 of 16 frames), person 7 (4 frames)
    does not; select_target_id then picks the single survivor."""
    t = np.arange(14, dtype=np.float64)
    bbox_a = np.stack(
        [120.0 + 4.0 * t, 210.0 + 2.0 * t, np.full(14, 150.0), np.full(14, 150.0)],
        axis=1,
    ).astype(np.float32)
    bbox_b = np.array(
        [[80.0, 120.0, 90.0, 90.0]] * 4, np.float32
    )
    return {
        4: {"bbox": bbox_a, "frames": np.arange(14)},
        7: {"bbox": bbox_b, "frames": np.arange(4)},
    }


def _tracking_copy(tracking):
    return {
        k: {kk: np.array(vv) for kk, vv in v.items()}
        for k, v in tracking.items()
    }


def _random_rotmats(n_frames, seed=77):
    """(F, 24, 3, 3) float32 exact rotations via cv2.Rodrigues."""
    import cv2

    rng = np.random.RandomState(seed)
    aa = rng.uniform(-1.0, 1.0, size=(n_frames, 24, 3))
    aa *= (rng.uniform(0.1, 2.6, size=(n_frames, 24, 1))
           / np.linalg.norm(aa, axis=-1, keepdims=True))
    rots = np.empty((n_frames, 24, 3, 3), np.float64)
    for f in range(n_frames):
        for j in range(24):
            rots[f, j] = cv2.Rodrigues(aa[f, j])[0]
    return rots.astype(np.float32)


class _FakeTracker:
    """Product-side stand-in with the MultiPersonTracker surface __call__
    touches (pipeline.py:628, 577): returns the scripted dict."""

    def __init__(self, tracking, detector):
        self.tracking = tracking
        self.detector = detector

    def __call__(self, frames_rgb):
        return _tracking_copy(self.tracking)


def _read_frames(path):
    from poserisk_release_tpu.io.video import read_video

    return read_video(path).frames


def _read(path):
    with open(path, "rb") as f:
        return f.read()


# --------------------------------------------------------------------------
# The end-to-end run (everything expensive happens once)
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    import cv2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import torch

    _install_chumpy_shim()
    _install_live_shims()
    for rel in ("lib", "lib/utils", "data", "lib/smplpytorch"):
        p = osp.join(REFERENCE_ROOT, rel)
        if p not in sys.path:
            sys.path.insert(0, p)
    from tests.test_reference_differential import _load_reference_module

    # A FRESH base module instance: binds the LIVE models.hmr dispatcher
    # (wave 3's instance bound the inert None placeholder).
    base = _load_reference_module("base_live", "lib/core/base.py")
    cfg_ref = base.cfg

    root = tmp_path_factory.mktemp("predictor_e2e")
    staging = root / "staging"
    model_dir = staging / "data" / "base_data" / "human_models"
    smpl_arrays = _write_smpl_pkls(str(model_dir))

    ckpt = str(root / "model_checkpoint.pt")
    torch.save({"model": {}}, ckpt)

    # Portrait clip: h=480 > 450 triggers the literal get_images resize
    # branch (it CRASHES on already-small videos -- executed pin in wave 3),
    # landing both ingests at 300x450.
    video = str(root / "clip.mp4")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 12.0,
                             (320, 480))
    assert writer.isOpened()
    for i in range(16):
        img = np.full((480, 320, 3), 25, np.uint8)
        cv2.rectangle(img, (90 + 6 * i, 140), (200 + 6 * i, 430),
                      (170, 140, 110), -1)
        cv2.circle(img, (60, 60 + 10 * i), 25, (60, 200, 60), -1)
        writer.write(img)
    writer.release()

    # Non-zero add-info so the score arithmetic terms are live on both sides.
    info = {
        "REBA": {
            "Legs_bilateral_weight_bearing/walking": 1, "Sitting": 1,
            "Load/Force Score": 1, "Arm_supported_leaning_L": 1,
            "Arm_supported_leaning_R": 0, "Coupling": 1, "Activity_Score": 1,
        },
        "RULA": {
            "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 1,
            "A_Muscle_use_L": 1, "A_Muscle_use_R": 0, "A_Load/Force_L": 1,
            "A_Load/Force_R": 0, "Legs_bilateral_weight_bearing": 1,
            "B_Muscle_use": 1, "B_Load/Force": 0,
        },
    }
    info_path = str(root / "additional_information.json")
    with open(info_path, "w") as f:
        json.dump(info, f)

    tracking = _scripted_tracking(16)
    rotmats = _random_rotmats(14)

    class _ScriptedSpin(torch.nn.Module):
        """Stands in for the never-shipped SPIN module: returns the
        predetermined rotmats batch by batch (torch DataLoader preserves
        order). eval() -- called once at the top of the literal
        get_pose_estimation_results (base.py:212) -- rewinds it, so
        repeated literal runs are deterministic."""

        def __init__(self):
            super().__init__()
            self._rots = torch.from_numpy(rotmats)
            self._pos = 0

        def eval(self):
            self._pos = 0
            return super().eval()

        def forward(self, batch):
            b = int(batch.shape[0])
            out = self._rots[self._pos:self._pos + b]
            assert out.shape[0] == b, "scripted SPIN exhausted"
            self._pos += b
            return out.clone(), torch.zeros((b, 10)), torch.zeros((b, 3))

    _SPIN_FACTORY[0] = lambda mean_params: _ScriptedSpin()
    _TRACKER_FN[0] = lambda image_folder: _tracking_copy(tracking)

    # ---- literal Predictor.__init__ (incl. the literal SMPL() wrapper
    # loading the pkls through the literal ready_arguments) ---------------
    args = SimpleNamespace(type="REBA, RULA", debug=True, debug_frame=-1,
                           debug_joints="Neck, L_Hip")
    old_ckpt = cfg_ref.SPIN.checkpoint
    old_workers = cfg_ref.DATASET.workers
    cfg_ref.SPIN.checkpoint = ckpt
    # Execution knob only (ordering is worker-count-independent in torch
    # DataLoader); 16 forked workers on this 1-core host would also fork a
    # JAX-initialised process per worker.
    cfg_ref.DATASET.workers = 0
    cwd = os.getcwd()
    try:
        os.chdir(staging)  # smpl.py:9 resolves its model dir relative to cwd
        lit = base.Predictor(args)
    finally:
        os.chdir(cwd)
        cfg_ref.SPIN.checkpoint = old_ckpt

    ref_out = str(root / "ref_out")
    got_out = str(root / "got_out")
    os.makedirs(ref_out, exist_ok=True)

    # ---- capture the literal pose chain (to inject into the product) ----
    image_path, img_num, fps, bboxes_sel, frames_sel = lit.data_loader(
        video, ref_out)
    dataset = base.CropDataset(
        image_folder=image_path, frames=frames_sel, bboxes=bboxes_sel,
        joints2d=None, scale=cfg_ref.DATASET.bbox_scale)
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=cfg_ref.DATASET.batch_size, num_workers=0)
    result_lit, joint_cam_lit, images_lit, debug_lit = (
        lit.get_pose_estimation_results(loader))

    # ---- full literal __call__ -------------------------------------------
    plt.close("all")
    with _PutTextU8(cv2):
        lit(video, info_path, ref_out)
    cfg_ref.DATASET.workers = old_workers

    # ---- product run on the same video/info, pose chain injected --------
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.detector import StubDetector
    from poserisk_release_tpu.pipeline import Predictor

    cfg_p = default_config().replace(
        DATASET={"jpeg_ingest": True},
        SPIN={"smpl_model_dir": str(model_dir)},
    )
    prod = Predictor(cfg=cfg_p, score_type="REBA,RULA", debug=True,
                     debug_joints="Neck,L_Hip", visualize=True,
                     detector=StubDetector())
    prod.tracker = _FakeTracker(tracking, StubDetector())
    prod.pose_estimator.run_from_frames = (
        lambda frames_rgb, frame_ids, bboxes, chunk=0: (
            result_lit.copy(), joint_cam_lit.copy(), debug_lit.copy()))
    plt.close("all")
    summary = prod(video, info_path, got_out)

    return SimpleNamespace(
        base=base, cfg_ref=cfg_ref, root=root, video=video,
        info_path=info_path, model_dir=str(model_dir),
        smpl_arrays=smpl_arrays, tracking=tracking, rotmats=rotmats,
        lit=lit, prod=prod, summary=summary,
        ref_out=ref_out, got_out=got_out,
        image_path=image_path, img_num=img_num, fps=fps,
        bboxes_sel=bboxes_sel, frames_sel=frames_sel,
        result=result_lit, joint_cam=joint_cam_lit, images=images_lit,
        debug_result=debug_lit,
    )


# --------------------------------------------------------------------------
# Selection + ingest + crop-loop semantics of the literal run
# --------------------------------------------------------------------------
def test_literal_selection_and_ingest(e2e):
    from poserisk_release_tpu.tracking.mpt import filter_and_select_target

    assert e2e.img_num == 16 and e2e.fps == pytest.approx(12.0)
    want_bbox, want_frames = filter_and_select_target(
        _tracking_copy(e2e.tracking), 16)
    np.testing.assert_array_equal(e2e.bboxes_sel, want_bbox)
    np.testing.assert_array_equal(e2e.frames_sel, want_frames)
    # The literal __call__ removed its tmp tree at the end (base.py:184).
    assert not osp.exists(e2e.image_path)
    # get_pose_estimation_results concatenation semantics: one row per
    # selected frame, crops stacked in frame order.
    assert e2e.result.shape == (14, 24, 3)
    assert e2e.joint_cam.shape == (14, 24, 3)
    assert e2e.images.shape == (14, 3, 224, 224)
    assert e2e.debug_result.shape == (14, 24, 3)


def test_pose_chain_consistency(e2e):
    """The injected contract is faithful: the literal method's outputs match
    the product's device pose chain on the same rotmats, within the
    documented precision classes (PARITY.md euler #8, LBS drift)."""
    import jax.numpy as jnp

    from poserisk_release_tpu.body.smpl import SMPLModel
    from poserisk_release_tpu.ops.lbs import joints_only, smpl_params_to_jax
    from poserisk_release_tpu.ops.rotations import (
        rotmat_to_axis_angle,
        rotmat_to_euler_deg,
    )
    from poserisk_release_tpu.throughput import ROOT_POSE

    rot = jnp.asarray(e2e.rotmats)
    euler_p = np.asarray(rotmat_to_euler_deg(rot))
    assert np.max(np.abs(euler_p - e2e.result)) < 0.02  # degrees

    aa_p = np.asarray(rotmat_to_axis_angle(rot))
    aa_forced = aa_p.copy()
    aa_forced[:, 0, :] = ROOT_POSE
    # get_joint_cam mutated the literal debug_result's root in place
    # (coord_utils.py:13) -- the product's aa_forced mirrors that quirk.
    assert np.max(np.abs(aa_forced - e2e.debug_result)) < 2e-4

    model = SMPLModel.load(e2e.model_dir, "neutral", allow_synthetic=False)
    params = smpl_params_to_jax(model)
    parents = np.asarray(model.kintree_parents).copy()
    parents[0] = 0
    joints = np.asarray(joints_only(
        params, jnp.asarray(aa_forced.reshape(14, -1), jnp.float32),
        tuple(int(p) for p in parents)))
    joints = joints * 1000.0
    joints = joints - joints[:, :1]
    assert np.max(np.abs(joints - e2e.joint_cam)) < 0.1  # mm


# --------------------------------------------------------------------------
# Artifact diffs: literal __call__ vs product __call__
# --------------------------------------------------------------------------
def test_result_txts_byte_equal(e2e):
    for name in ("reba_result.txt", "rula_result.txt"):
        want = _read(osp.join(e2e.ref_out, name))
        got = _read(osp.join(e2e.got_out, name))
        assert got == want, name


def test_score_plots_byte_equal(e2e):
    for name in ("REBA_score.png", "RULA_score.png"):
        want = _read(osp.join(e2e.ref_out, name))
        got = _read(osp.join(e2e.got_out, name))
        assert got == want, name


def test_debug_csvs_byte_equal(e2e):
    for name in ("pose_log.csv", "REBA_score_log.csv",
                 "REBA_eval_pose_log.csv", "RULA_score_log.csv",
                 "RULA_eval_pose_log.csv"):
        want = _read(osp.join(e2e.ref_out, "debug", name))
        got = _read(osp.join(e2e.got_out, "debug", name))
        assert got == want, name


def test_result_videos_frame_equal(e2e):
    """Decoded-frame equality of the annotated mp4s (encoder invocation is
    identical -- same fourcc/fps/size -- so decode-compare is the robust
    form of byte equality)."""
    for name in ("REBA_video.mp4", "RULA_video.mp4"):
        want = _read_frames(osp.join(e2e.ref_out, name))
        got = _read_frames(osp.join(e2e.got_out, name))
        assert want.shape == got.shape, name
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_summary_matches_literal_txt(e2e):
    """The product's structured summary agrees with the literal txt files'
    5-tuple (consistency of the machine-readable extension)."""
    for title in ("REBA", "RULA"):
        final_scores, _level, _name = e2e.summary[title]
        txt = open(osp.join(e2e.ref_out, f"{title.lower()}_result.txt")).read()
        assert txt.startswith(f"AVG Score: {final_scores[0]} ")


# --------------------------------------------------------------------------
# The debug_frame >= 0 early-return branch (base.py:129-135)
# --------------------------------------------------------------------------
def test_debug_frame_branch_literal(e2e, tmp_path):
    import cv2
    import matplotlib.pyplot as plt
    import torch

    base, cfg_ref = e2e.base, e2e.cfg_ref
    args = SimpleNamespace(type="REBA", debug=True, debug_frame=5,
                           debug_joints="")
    old_ckpt = cfg_ref.SPIN.checkpoint
    old_workers = cfg_ref.DATASET.workers
    cfg_ref.SPIN.checkpoint = str(e2e.root / "model_checkpoint.pt")
    cfg_ref.DATASET.workers = 0
    cwd = os.getcwd()
    try:
        os.chdir(e2e.root / "staging")
        lit = base.Predictor(args)
    finally:
        os.chdir(cwd)
        cfg_ref.SPIN.checkpoint = old_ckpt

    ref_out = str(tmp_path / "ref_dbg")
    os.makedirs(ref_out, exist_ok=True)
    plt.close("all")
    with _PutTextU8(cv2):
        assert lit(e2e.video, e2e.info_path, ref_out) is None
    cfg_ref.DATASET.workers = old_workers
    assert not osp.exists(osp.join(ref_out, "tmp"))

    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.detector import StubDetector
    from poserisk_release_tpu.pipeline import Predictor

    cfg_p = default_config().replace(
        DATASET={"jpeg_ingest": True},
        SPIN={"smpl_model_dir": e2e.model_dir},
    )
    prod = Predictor(cfg=cfg_p, score_type="REBA", debug=True, debug_frame=5,
                     visualize=False, detector=StubDetector())
    prod.tracker = _FakeTracker(e2e.tracking, StubDetector())
    prod.pose_estimator.run_from_frames = (
        lambda frames_rgb, frame_ids, bboxes, chunk=0: (
            e2e.result.copy(), e2e.joint_cam.copy(), e2e.debug_result.copy()))
    got_out = str(tmp_path / "got_dbg")
    plt.close("all")
    assert prod(e2e.video, e2e.info_path, got_out) is None

    # joint_3d.png: same injected joint_cam -> byte-equal figure.
    want = _read(osp.join(ref_out, "debug", "joint_3d.png"))
    got = _read(osp.join(got_out, "debug", "joint_3d.png"))
    assert got == want

    # smpl_model.obj: the literal torch layer forward vs the product's f32
    # LBS -- same face block byte-for-byte, vertices within the measured
    # torch-vs-jax drift class (3.6e-7 m; obj is in mm).
    def parse_obj(path):
        verts, faces = [], []
        for line in open(path):
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                faces.append(line.strip())
        return np.array(verts), faces

    vw, fw = parse_obj(osp.join(ref_out, "debug", "smpl_model.obj"))
    vg, fg = parse_obj(osp.join(got_out, "debug", "smpl_model.obj"))
    assert fg == fw
    assert vw.shape == vg.shape == (6890, 3)
    assert np.max(np.abs(vg - vw)) < 0.05  # mm


# --------------------------------------------------------------------------
# The literal main/run.py entry point (argparse -> Predictor -> __call__)
# --------------------------------------------------------------------------
def test_literal_run_py_matches_product(e2e, tmp_path, monkeypatch):
    """Executes the OUTERMOST reference entry point literally: main/run.py
    parses argv at import time (the reason it was classed unreachable),
    boots __init_path, constructs the weight-loading Predictor, and runs the
    clip end to end. Its artifacts must equal the product run's (got_out)
    byte-for-byte -- the scripted SPIN returns the same rotmats, so this is
    the full outer loop diffed at the file level."""
    import runpy

    import cv2
    import matplotlib.pyplot as plt

    main_dir = osp.join(REFERENCE_ROOT, "main")
    if main_dir not in sys.path:  # run_path does not add the script dir
        monkeypatch.syspath_prepend(main_dir)
    out = str(tmp_path / "run_py_out")
    monkeypatch.setattr(sys, "argv", [
        "run.py", "--input", e2e.video, "--info", e2e.info_path,
        "--output", out, "--type", "REBA,RULA",
        "--debug", "--debug_joints", "Neck,L_Hip",
    ])
    monkeypatch.setenv("CUDA_VISIBLE_DEVICES", "")
    cfg_ref = e2e.cfg_ref
    old_ckpt = cfg_ref.SPIN.checkpoint
    old_workers = cfg_ref.DATASET.workers
    cfg_ref.SPIN.checkpoint = str(e2e.root / "model_checkpoint.pt")
    cfg_ref.DATASET.workers = 0
    cwd = os.getcwd()
    plt.close("all")
    try:
        os.chdir(e2e.root / "staging")  # literal SMPL() model dir
        with _PutTextU8(cv2):
            runpy.run_path(osp.join(REFERENCE_ROOT, "main", "run.py"),
                           run_name="__main__")
    finally:
        os.chdir(cwd)
        cfg_ref.SPIN.checkpoint = old_ckpt
        cfg_ref.DATASET.workers = old_workers

    for name in ("reba_result.txt", "rula_result.txt",
                 "REBA_score.png", "RULA_score.png"):
        assert _read(osp.join(out, name)) == _read(
            osp.join(e2e.got_out, name)), name
    for name in ("pose_log.csv", "REBA_score_log.csv",
                 "REBA_eval_pose_log.csv", "RULA_score_log.csv",
                 "RULA_eval_pose_log.csv"):
        assert _read(osp.join(out, "debug", name)) == _read(
            osp.join(e2e.got_out, "debug", name)), name
    for name in ("REBA_video.mp4", "RULA_video.mp4"):
        np.testing.assert_array_equal(
            _read_frames(osp.join(out, name)),
            _read_frames(osp.join(e2e.got_out, name)), err_msg=name)


# --------------------------------------------------------------------------
# The literal main/data_preprocessing.py offline dataset builder
# --------------------------------------------------------------------------
def test_literal_data_preprocessing_matches_product(e2e, tmp_path,
                                                    monkeypatch):
    """Executes the literal offline builder's main() (it needs only the MPT
    shim -- no model weights at all) against the product tool on identical
    source trees. Structure is compared exactly (tree layout, chunk
    slicing NUM_FRAMES = int(MIN_SEC*fps), jpg counts, mp4 naming, tmp
    cleanup); pixels within the cv2-fixed-point-vs-separable-matmul crop
    class (test_crop_dataset_literal's bound) plus the jpg-round/mp4-trunc
    write classes. Two literal quirks pinned by execution and documented as
    product deviations (tools/data_preprocessing.py docstring): the
    `sorted(dirs)[4:]` resume offset, and rounded-jpg/truncated-mp4 writes
    of the same crops."""
    import cv2
    import torch

    main_dir = osp.join(REFERENCE_ROOT, "main")
    if main_dir not in sys.path:
        monkeypatch.syspath_prepend(main_dir)
    _install_live_shims()

    # Scripted tracking shared by both sides: person 3 spans 35 of 40
    # frames at fps 2 -> NUM_FRAMES = 16 -> two chunks; person 9 (10
    # frames) is filtered out.
    t = np.arange(35, dtype=np.float64)
    tracking = {
        3: {"bbox": np.stack([70.0 + 0.8 * t, 58.0 + 0.3 * t,
                              np.full(35, 62.0), np.full(35, 62.0)],
                             axis=1).astype(np.float32),
            "frames": np.arange(35)},
        9: {"bbox": np.array([[40.0, 40.0, 30.0, 30.0]] * 10, np.float32),
            "frames": np.arange(10)},
    }
    _TRACKER_FN[0] = lambda image_folder: _tracking_copy(tracking)

    def make_tree(root):
        # Five source dirs: d0 and d4 hold the same clip; the literal
        # `dir_names[4:]` only ever sees d4.
        for d in range(5):
            os.makedirs(root / "videos" / "train" / f"d{d}", exist_ok=True)
        for d in (0, 4):
            path = str(root / "videos" / "train" / f"d{d}" / "clip.mp4")
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0,
                                (160, 120))
            assert w.isOpened()
            rng = np.random.RandomState(7)
            for i in range(40):
                img = np.full((120, 160, 3), 20, np.uint8)
                cv2.rectangle(img, (40 + i, 30), (104 + i, 88),
                              (160, 130, 100), -1)
                img += rng.randint(0, 8, size=img.shape).astype(np.uint8)
                w.write(img)
            w.release()

    lit_root = tmp_path / "lit"
    prod_root = tmp_path / "prod"
    make_tree(lit_root)
    make_tree(prod_root)

    # Execution knob only: the literal DataLoader(num_workers=8) would fork
    # 8 workers inside this JAX-initialised 1-core process; ordering is
    # worker-count-independent.
    orig_dl = torch.utils.data.DataLoader

    def dl(*a, **k):
        k["num_workers"] = 0
        return orig_dl(*a, **k)

    monkeypatch.setattr(torch.utils.data, "DataLoader", dl)
    from tests.test_reference_differential import _load_reference_module

    lit_mod = _load_reference_module(
        "data_preprocessing_live", "main/data_preprocessing.py")
    lit_mod.main(str(lit_root / "videos" / "train"))

    from poserisk_release_tpu.tools.data_preprocessing import main as prod_main

    written = prod_main(str(prod_root / "videos" / "train"),
                        tracker=lambda frames: _tracking_copy(tracking),
                        jpeg_ingest=True)

    # The [4:] quirk: the literal skipped d0 entirely; the product (a
    # documented deviation) processed it.
    assert not osp.isdir(lit_root / "images" / "train" / "d0" / "clip")
    assert osp.isdir(prod_root / "images" / "train" / "d0" / "clip")
    assert len(written) == 4  # d0 + d4, two chunks each

    # d4: identical structure.
    for pid in ("0", "1"):
        lit_imgs = sorted(os.listdir(
            lit_root / "images" / "train" / "d4" / "clip" / pid))
        prod_imgs = sorted(os.listdir(
            prod_root / "images" / "train" / "d4" / "clip" / pid))
        assert lit_imgs == prod_imgs
        assert len(lit_imgs) == 16  # int(MIN_SEC * fps) = int(8 * 2)
        assert lit_imgs[0] == "000000.jpg"
        # Pixel class: crop-impl + jpeg-write rounding differences only.
        for name in lit_imgs[::5]:
            want = cv2.imread(str(
                lit_root / "images" / "train" / "d4" / "clip" / pid / name))
            got = cv2.imread(str(
                prod_root / "images" / "train" / "d4" / "clip" / pid / name))
            diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
            assert diff.max() <= 16 and diff.mean() < 2.0, name
    # The literal removed its tmp jpg tree (data_preprocessing.py:128-129).
    assert not osp.isdir(lit_root / "images" / "train" / "d4" / "clip" / "tmp")

    for name in ("clip_0.mp4", "clip_1.mp4"):
        want = _read_frames(str(
            lit_root / "processed_videos" / "train" / "d4" / name))
        got = _read_frames(str(
            prod_root / "processed_videos" / "train" / "d4" / name))
        assert want.shape == got.shape == (16, 224, 224, 3), name
        diff = np.abs(want.astype(np.int32) - got.astype(np.int32))
        assert diff.mean() < 3.0, name


# --------------------------------------------------------------------------
# The literal SMPL wrapper __init__ (lib/utils/smpl.py:7-45)
# --------------------------------------------------------------------------
def test_literal_smpl_wrapper_matches_product(e2e):
    from poserisk_release_tpu.body.smpl import SMPLFamily

    lit_smpl = e2e.lit.smpl_model
    fam = SMPLFamily(e2e.model_dir, allow_synthetic=False)

    assert lit_smpl.vertex_num == fam.vertex_num == 6890
    assert list(lit_smpl.joints_name) == list(fam.joints_name)
    assert list(lit_smpl.joints_name_upper) == list(fam.joints_name_upper)
    assert tuple(lit_smpl.skeleton) == tuple(fam.skeleton)
    assert tuple(lit_smpl.flip_pairs) == tuple(fam.flip_pairs)
    assert lit_smpl.root_joint_idx == fam.root_joint_idx == 0
    np.testing.assert_array_equal(lit_smpl.face, fam.face)
    # 29-row extended regressor incl. the 5 one-hot face rows
    # (smpl.py:16-28) -- the literal rows come from the pkl via the literal
    # ready_arguments under the numpy chumpy shim.
    assert lit_smpl.joint_regressor.shape == fam.joint_regressor.shape == (29, 6890)
    np.testing.assert_allclose(
        lit_smpl.joint_regressor, fam.joint_regressor, atol=1e-7)
    # The literal layer's buffers round-tripped the pkl intact.
    np.testing.assert_allclose(
        lit_smpl.layer["neutral"].th_v_template.numpy()[0],
        e2e.smpl_arrays["v_template"], atol=1e-7)
