"""Differential tests wave 2: literal _img_utils / vis_utils / funcs_utils.

Round 3's differential suite (test_reference_differential.py) executes the
literal reference reba/rula/coord_utils/smooth_bbox/smpl_layer modules as
in-process oracles. Three modules stayed restatement-only because their
top-level imports are unsatisfiable in this image: `_img_utils.py` needs
torchvision and `vis_utils.py`/`funcs_utils.py` need easydict (via
core.config). This wave closes that gap with two tiny shims implemented
from those libraries' PUBLIC semantics (ToTensor/Normalize/Compose,
EasyDict) -- not from reference code -- so the literal files import, and
then machine-diffs every product counterpart against the executed original:

  _img_utils.py  (/root/reference/lib/utils/_img_utils.py)
      gen_trans_from_patch_cv + trans_point2d, generate_patch_image_cv,
      get_single_image_crop(_demo), get_image_crops (axis quirk),
      convert_cvimg_to_tensor / read_image, torch2numpy (0.255 typo) /
      torch_vid2numpy, get_bbox_from_kp2d, normalize_2d_kp,
      split_into_chunks (its `view_as_windows` import is commented out
      upstream, _img_utils.py:24 -- the standard skimage semantics are
      injected post-load so the otherwise-literal body runs)
  vis_utils.py   (/root/reference/lib/utils/vis_utils.py)
      visualize_box, vis_coco_skeleton, vis_keypoints,
      vis_keypoints_with_skeleton, save_obj, pose_to_str, plot_joint_error
  funcs_utils.py (/root/reference/lib/utils/funcs_utils.py)
      get_images (video -> jpg ingest incl. the <=800w/<=450h resize rule),
      select_target_id, sample_image_feature, save_plot

The reference tree is read-only spec input; nothing here mutates it.
"""

import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

from tests.test_reference_differential import _load_reference_module

REFERENCE_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.smoke,  # small jit graphs only (crop / feature sampling)
    pytest.mark.skipif(
        not osp.isdir(osp.join(REFERENCE_ROOT, "lib")),
        reason="reference tree not present",
    ),
]


# --------------------------------------------------------------------------
# Third-party shims (public-API semantics, just enough for the literal
# modules' call sites in this file)
# --------------------------------------------------------------------------
def _install_torchvision_shim():
    """torchvision.transforms.{Compose,ToTensor,Normalize} with torchvision's
    documented semantics: ToTensor maps HWC uint8 -> CHW float/255 (other
    dtypes: permute only), Normalize maps CHW -> (x - mean) / std."""
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401 -- real package wins if present

        return
    except ImportError:
        pass
    import torch

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if arr.dtype == np.uint8:
                return t.float().div(255.0)
            return t.float()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")
    tff = types.ModuleType("torchvision.transforms.functional")
    tf.Compose, tf.ToTensor, tf.Normalize = Compose, ToTensor, Normalize
    tff.to_tensor = ToTensor()  # functional form (demo_dataset.py:23)
    tf.functional = tff
    tv.transforms = tf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf
    sys.modules["torchvision.transforms.functional"] = tff


def _install_easydict_shim():
    """easydict.EasyDict: a dict whose items are attributes (recursively)."""
    if "easydict" in sys.modules:
        return
    try:
        import easydict  # noqa: F401

        return
    except ImportError:
        pass

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            for k, v in {**(d or {}), **kwargs}.items():
                setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            elif isinstance(value, (list, tuple)):
                value = type(value)(
                    EasyDict(v) if isinstance(v, dict) else v for v in value
                )
            super().__setitem__(name, value)

        __setitem__ = __setattr__

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name) from None

    mod = types.ModuleType("easydict")
    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def _view_as_windows_1d(arr, window_shape, step=1):
    """skimage.util.shape.view_as_windows for the 1-D case the reference
    uses (split_into_chunks calls it on a 1-D index array)."""
    (win,) = window_shape
    return np.lib.stride_tricks.sliding_window_view(arr, win)[::step]


# --------------------------------------------------------------------------
# Literal-module loaders
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_img():
    _install_torchvision_shim()
    mod = _load_reference_module("img_utils", "lib/utils/_img_utils.py")
    # The reference's own `from skimage.util.shape import view_as_windows`
    # is commented out (_img_utils.py:24); split_into_chunks still calls it.
    mod.view_as_windows = _view_as_windows_1d
    return mod


def _load_with_core_config(name, relpath):
    """vis_utils/funcs_utils do `from core.config import cfg`; satisfy it by
    putting the reference's lib dir on sys.path (config.py has no import-time
    side effects: it only builds the cfg EasyDict)."""
    _install_easydict_shim()
    import matplotlib

    matplotlib.use("Agg")
    lib_dir = osp.join(REFERENCE_ROOT, "lib")
    if lib_dir not in sys.path:
        sys.path.insert(0, lib_dir)
    return _load_reference_module(name, relpath)


@pytest.fixture(scope="module")
def ref_vis():
    return _load_with_core_config("vis_utils", "lib/utils/vis_utils.py")


@pytest.fixture(scope="module")
def ref_funcs():
    return _load_with_core_config("funcs_utils", "lib/utils/funcs_utils.py")


# --------------------------------------------------------------------------
# _img_utils: crop transform chain
# --------------------------------------------------------------------------
def test_trans_matrix_and_point_mapping(rng, ref_img):
    from poserisk_release_tpu.io.keypoints import affine_transform_points

    for _ in range(50):
        cx, cy = rng.uniform(0, 500, 2)
        w, h = rng.uniform(5, 300, 2)
        scale = rng.uniform(0.8, 1.6)
        rot = rng.uniform(-90, 90)
        out_w, out_h = int(rng.choice([64, 224])), int(rng.choice([64, 224]))
        trans = ref_img.gen_trans_from_patch_cv(
            cx, cy, w, h, out_w, out_h, scale, rot
        )
        pts = rng.uniform(-100, 600, size=(16, 2))
        want = np.stack([ref_img.trans_point2d(p, trans) for p in pts])
        got = affine_transform_points(pts, cx, cy, w, h, out_w, out_h,
                                      scale, rot_deg=rot)
        # the reference rounds its src/dst control points to float32: ~1e-7
        # relative error, magnified on points mapped far outside the patch
        np.testing.assert_allclose(got, want, rtol=3e-6, atol=2e-3)

        # inv=True is the literal matrix inverse: mapping forward with the
        # product then back with the reference's inverse must be identity
        inv = ref_img.gen_trans_from_patch_cv(
            cx, cy, w, h, out_w, out_h, scale, rot, inv=True
        )
        back = np.stack([ref_img.trans_point2d(p, inv) for p in got])
        np.testing.assert_allclose(back, pts, rtol=3e-6, atol=5e-3)


def test_transfrom_keypoints_literal(rng, ref_img):
    from poserisk_release_tpu.io import keypoints as kpmod

    for _ in range(10):
        cx, cy = rng.uniform(50, 400, 2)
        w, h = rng.uniform(20, 200, 2)
        kp = rng.uniform(0, 450, size=(25, 2))
        want, _ = ref_img.transfrom_keypoints(
            kp.copy(), cx, cy, w, h, 224, 224, do_augment=False
        )
        got = kpmod.transfrom_keypoints(kp.copy(), cx, cy, w, h, 224, 224)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_generate_patch_image_cv_vs_crop_batch_affine(rng, ref_img):
    import jax.numpy as jnp

    from poserisk_release_tpu.ops.crop import crop_batch_affine

    img = rng.randint(0, 256, size=(240, 320, 3), dtype=np.uint8)
    cases = [
        # (cx, cy, w, h, scale, rot, flip)
        (160.0, 120.0, 100.0, 150.0, 1.2, 0.0, False),
        (40.0, 30.0, 120.0, 120.0, 1.3, 0.0, False),   # spills top-left
        (300.0, 220.0, 90.0, 70.0, 1.2, 25.0, False),  # rotated
        (160.0, 120.0, 100.0, 150.0, 1.2, -40.0, True),  # rot + flip
        (160.0, 120.0, 100.0, 150.0, 1.0, 0.0, True),  # flip only
    ]
    for cx, cy, w, h, scale, rot, flip in cases:
        want, _ = ref_img.generate_patch_image_cv(
            img, cx, cy, w, h, 224, 224, flip, scale, rot
        )
        got = np.asarray(crop_batch_affine(
            jnp.asarray(img[None]),
            jnp.asarray([[cx, cy, w, h]], jnp.float32),
            jnp.asarray([scale], jnp.float32),
            jnp.asarray([rot], jnp.float32),
            jnp.asarray([flip]),
            jnp.ones((1, 3), jnp.float32),
            out_size=224,
        ))[0]
        # cv2 INTER_LINEAR quantises weights to 1/32 (same class as
        # tests/test_crop.py); compare in [0, 1]
        diff = np.abs(got - want.astype(np.float32) / 255.0)
        assert diff.max() < 0.045, (cx, cy, rot, flip)
        assert diff.mean() < 0.004, (cx, cy, rot, flip)


def test_get_single_image_crop_and_demo_literal(rng, ref_img):
    from poserisk_release_tpu.io import images as im

    img = rng.randint(0, 256, size=(200, 260, 3), dtype=np.uint8)
    bbox = np.array([130.0, 100.0, 90.0, 140.0])

    want = ref_img.get_single_image_crop(img, None, bbox, scale=1.3).numpy()
    got = im.get_single_image_crop(img, bbox, scale=1.3)
    diff = np.abs(got - want.transpose(1, 2, 0))
    assert diff.max() < 0.045 and diff.mean() < 0.004

    kp = rng.uniform(0, 250, size=(25, 3))
    want_crop, want_raw, want_kp = ref_img.get_single_image_crop_demo(
        img, bbox, kp.copy(), scale=1.2, crop_size=224
    )
    got_crop, got_raw, got_kp = im.get_single_image_crop_demo(
        img, bbox, kp.copy(), scale=1.2, crop_size=224
    )
    diff = np.abs(got_crop - want_crop.numpy().transpose(1, 2, 0))
    assert diff.max() < 0.045 and diff.mean() < 0.004
    # raw crop: uint8 warp vs rint(bilinear * 255) under the same 1/32 class
    rdiff = np.abs(got_raw.astype(np.int32) - want_raw.astype(np.int32))
    assert rdiff.max() <= 12 and rdiff.mean() < 1.5
    np.testing.assert_allclose(got_kp[:, :2], want_kp[:, :2], atol=2e-3)
    np.testing.assert_allclose(got_kp[:, 2], want_kp[:, 2])  # conf untouched


def test_get_image_crops_axis_quirk_literal(rng, ref_img, tmp_path):
    import cv2

    from poserisk_release_tpu.io.images import get_image_crops

    img = rng.randint(0, 256, size=(220, 300, 3), dtype=np.uint8)
    path = str(tmp_path / "still.png")  # lossless: both sides read identical pixels
    cv2.imwrite(path, img)
    # [?1, ?2, ?3, ?4] boxes -- the reference treats them rows-first
    bboxes = np.array([
        [40.0, 60.0, 180.0, 200.0],
        [10.0, 10.0, 120.0, 260.0],
    ])
    want = ref_img.get_image_crops(path, bboxes).numpy()  # (N, C, H, W)
    got = get_image_crops(path, bboxes)  # (N, H, W, C)
    assert got.shape == (2, 224, 224, 3)
    diff = np.abs(got - want.transpose(0, 2, 3, 1))
    assert diff.max() < 0.045 and diff.mean() < 0.004


# --------------------------------------------------------------------------
# _img_utils: tensor conversions and keypoint helpers
# --------------------------------------------------------------------------
def test_tensor_conversions_literal(rng, ref_img, tmp_path):
    import cv2
    import torch

    from poserisk_release_tpu.io import images as im

    u8 = rng.randint(0, 256, size=(50, 60, 3), dtype=np.uint8)
    want = ref_img.convert_cvimg_to_tensor(u8).numpy()  # CHW [0,1]
    np.testing.assert_allclose(
        im.convert_cvimg_to_tensor(u8), want.transpose(1, 2, 0), atol=0
    )

    path = str(tmp_path / "frame.png")
    cv2.imwrite(path, u8)
    want = ref_img.read_image(path).numpy()
    np.testing.assert_allclose(
        im.read_image(path), want.transpose(1, 2, 0), atol=0
    )

    # torch2numpy / imagenet_denormalize, incl. the 0.255 blue-channel typo
    chw = rng.uniform(-2.5, 2.5, size=(3, 40, 30)).astype(np.float32)
    want = ref_img.torch2numpy(torch.from_numpy(chw))
    got = im.imagenet_denormalize(chw)
    assert got.dtype == want.dtype == np.uint8
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1

    vid = rng.uniform(-2.5, 2.5, size=(2, 4, 3, 16, 12)).astype(np.float32)
    want = ref_img.torch_vid2numpy(torch.from_numpy(vid))
    got = im.video_denormalize(vid)
    assert got.dtype == want.dtype == np.uint8
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_kp_bbox_and_normalize_literal(rng, ref_img):
    from poserisk_release_tpu.io import keypoints as kpmod

    kp1 = rng.uniform(0, 400, size=(25, 2))
    kp2 = rng.uniform(0, 400, size=(7, 25, 2))
    np.testing.assert_allclose(
        kpmod.get_bbox_from_kp2d(kp1), ref_img.get_bbox_from_kp2d(kp1)
    )
    np.testing.assert_allclose(
        kpmod.get_bbox_from_kp2d(kp2), ref_img.get_bbox_from_kp2d(kp2)
    )
    kp = rng.uniform(-50, 300, size=(25, 2))
    np.testing.assert_allclose(
        kpmod.normalize_2d_kp(kp), ref_img.normalize_2d_kp(kp)
    )
    norm = rng.uniform(-1, 1, size=(25, 2))
    np.testing.assert_allclose(
        kpmod.normalize_2d_kp(norm, inv=True),
        ref_img.normalize_2d_kp(norm, inv=True),
    )


def test_split_into_chunks_literal(rng, ref_img):
    from poserisk_release_tpu.train.datasets import split_into_chunks

    # several videos of varying lengths, incl. one shorter than seqlen
    vid_names = np.concatenate([
        np.full(n, f"vid{i}") for i, n in enumerate([100, 7, 33, 64, 17])
    ])
    for seqlen, stride in [(16, 16), (16, 8), (8, 3), (32, 1)]:
        for is_train in (True, False):
            for match_vibe in (True, False):
                want = ref_img.split_into_chunks(
                    vid_names, seqlen, stride,
                    is_train=is_train, match_vibe=match_vibe,
                )
                got = split_into_chunks(
                    vid_names, seqlen, stride,
                    is_train=is_train, match_vibe=match_vibe,
                )
                assert [list(x) for x in got] == [list(x) for x in want], (
                    seqlen, stride, is_train, match_vibe,
                )


# --------------------------------------------------------------------------
# vis_utils: drawing / writers
# --------------------------------------------------------------------------
def test_visualize_box_literal(rng, ref_vis):
    from poserisk_release_tpu.outputs.render import draw_box_cxcywh

    img = rng.randint(0, 256, size=(120, 160, 3), dtype=np.uint8)
    boxes = rng.uniform(10, 110, size=(3, 4))
    want = ref_vis.visualize_box(img, boxes)
    got = img.copy()
    for box in boxes:
        got = draw_box_cxcywh(got, box)
    np.testing.assert_array_equal(got, want)


def test_vis_coco_skeleton_literal(rng, ref_vis):
    from poserisk_release_tpu.outputs.render import vis_coco_skeleton

    img = rng.randint(0, 256, size=(150, 150, 3), dtype=np.uint8)
    kps = rng.uniform(5, 145, size=(2, 17))
    skeleton = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    for color, alpha in [((0, 1, 0), 1.0), ((0.2, 0.5, 0.9), 0.6)]:
        want = ref_vis.vis_coco_skeleton(img, kps, skeleton, list(color),
                                         alpha=alpha)
        got = vis_coco_skeleton(img, kps, skeleton, given_color=color,
                                alpha=alpha)
        np.testing.assert_array_equal(got, want)


def test_vis_keypoints_literal(rng, ref_vis):
    from poserisk_release_tpu.outputs import render as r

    img = rng.randint(0, 256, size=(100, 130, 3), dtype=np.uint8)
    kps = rng.uniform(5, 95, size=(17, 2))
    np.testing.assert_array_equal(
        r.vis_keypoints(img, kps, alpha=0.7),
        ref_vis.vis_keypoints(img, kps, alpha=0.7),
    )

    kps3 = np.vstack([rng.uniform(5, 95, size=(2, 17)),
                      rng.uniform(0, 1, size=(1, 17))])
    skeleton = [(0, 1), (2, 3), (4, 5), (6, 7)]
    np.testing.assert_array_equal(
        r.vis_keypoints_with_skeleton(img, kps3, skeleton, kp_thresh=0.4),
        ref_vis.vis_keypoints_with_skeleton(img, kps3, skeleton,
                                            bbox=None, kp_thre=0.4),
    )


def test_save_obj_and_pose_to_str_literal(rng, ref_vis, tmp_path):
    from poserisk_release_tpu.outputs.writers import pose_to_str, save_obj

    verts = rng.randn(50, 3).astype(np.float32)
    faces = rng.randint(0, 50, size=(30, 3)).astype(np.int64)
    ref_path, got_path = str(tmp_path / "ref.obj"), str(tmp_path / "got.obj")
    ref_vis.save_obj(verts, faces, ref_path)
    save_obj(verts, faces, got_path)
    with open(ref_path, "rb") as f:
        want = f.read()
    with open(got_path, "rb") as f:
        got = f.read()
    assert got == want  # byte parity

    poses = rng.randn(4, 24, 3)
    assert pose_to_str(poses) == ref_vis.pose_to_str(poses)


def test_plot_joint_error_literal(rng, ref_vis, tmp_path):
    from poserisk_release_tpu.train.plots import plot_joint_error

    mpjpe = rng.uniform(20, 80, size=120)
    mpjve = rng.uniform(5, 40, size=119)
    mpjae = rng.uniform(1, 10, size=118)

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    # plot_joint_error reads the module-global cfg.graph_dir (vis_utils.py:260)
    ref_vis.cfg.graph_dir = str(ref_dir)
    ref_vis.plot_joint_error(mpjpe.copy(), mpjve.copy(), mpjae.copy())

    got_dir = tmp_path / "got"
    p1, p2 = plot_joint_error(mpjpe, mpjve, mpjae, str(got_dir))
    for name, got_path in [("mpjpe.jpg", p1), ("mpjve_&_mpjae.jpg", p2)]:
        with open(ref_dir / name, "rb") as f:
            want = f.read()
        with open(got_path, "rb") as f:
            got = f.read()
        assert got == want, name  # same matplotlib -> byte-identical jpgs


# --------------------------------------------------------------------------
# funcs_utils: ingest / selection / feature sampling / loss plot
# --------------------------------------------------------------------------
def _synthetic_mp4(path, w=900, h=500, n=8, fps=20.0):
    import cv2

    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert writer.isOpened()
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        frame = np.stack([
            ((xx + 13 * i) % 256), ((yy + 7 * i) % 256), ((xx + yy) % 256)
        ], axis=-1).astype(np.uint8)
        writer.write(frame)
    writer.release()


def test_get_images_literal(ref_funcs, tmp_path):
    """The literal video->jpg ingest (resize rule + '%09d.jpg' tree +
    (count, fps) return) vs read_video + dump_frames."""
    from poserisk_release_tpu.io.video import dump_frames, read_video

    video = str(tmp_path / "clip.mp4")
    _synthetic_mp4(video, w=900, h=500, n=8)  # w > 800 triggers the resize

    ref_dir = str(tmp_path / "ref_frames")
    n_ref, fps_ref = ref_funcs.get_images(video, ref_dir)

    clip = read_video(video)
    got_dir = str(tmp_path / "got_frames")
    n_got = dump_frames(clip, got_dir)

    assert n_got == n_ref
    assert clip.fps == pytest.approx(fps_ref)
    assert clip.frames.shape[1:3] == (444, 800)  # int(500 * 800 / 900) = 444
    for idx in range(n_ref):
        name = "{0:09d}.jpg".format(idx)
        with open(osp.join(ref_dir, name), "rb") as f:
            want = f.read()
        with open(osp.join(got_dir, name), "rb") as f:
            got = f.read()
        assert got == want, name  # identical pixels -> identical jpg bytes


def test_select_target_id_literal(rng, ref_funcs):
    from poserisk_release_tpu.tracking.mpt import filter_and_select_target

    for _ in range(10):
        n_tracks = int(rng.randint(2, 6))
        tracks = {}
        for pid in range(n_tracks):
            n = int(rng.randint(60, 100))
            tracks[pid] = {
                "bbox": rng.uniform(10, 200, size=(n, 4)),
                "frames": np.arange(n),
            }
        want_idx = int(ref_funcs.select_target_id(list(tracks.values())))
        got_bbox, got_frames = filter_and_select_target(tracks, total_frames=100)
        np.testing.assert_array_equal(got_bbox, tracks[want_idx]["bbox"])
        np.testing.assert_array_equal(got_frames, tracks[want_idx]["frames"])


def test_sample_image_feature_literal(rng, ref_funcs):
    import jax.numpy as jnp
    import torch

    from poserisk_release_tpu.ops.sampling import sample_image_feature

    C, H, W = 5, 14, 14
    width, height = 224.0, 224.0
    feat = rng.randn(C, H, W).astype(np.float32)
    # interior points, the one-pixel border band, and out-of-range points
    xy = np.concatenate([
        rng.uniform(0, 224, size=(40, 2)),
        rng.uniform(-8, 8, size=(10, 2)),
        rng.uniform(216, 240, size=(10, 2)),
    ]).astype(np.float32)
    want = ref_funcs.sample_image_feature(
        torch.from_numpy(feat[None]), torch.from_numpy(xy), width, height
    ).numpy()
    got = np.asarray(sample_image_feature(
        jnp.asarray(feat), jnp.asarray(xy), width, height
    ))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_save_plot_literal(rng, ref_funcs, tmp_path):
    """save_plot writes a pdf whose bytes embed a creation timestamp; pin it
    for the comparison so byte parity is meaningful."""
    import matplotlib

    from poserisk_release_tpu.train.plots import save_plot

    losses = rng.uniform(0.1, 2.0, size=9)
    with matplotlib.rc_context({"pdf.compression": 0}):
        os.environ["SOURCE_DATE_EPOCH"] = "0"
        try:
            ref_dir = tmp_path / "ref"
            ref_dir.mkdir()
            ref_funcs.cfg.graph_dir = str(ref_dir)
            ref_funcs.save_plot(list(losses), epoch=3)
            got_path = save_plot(list(losses), epoch=3, graph_dir=str(tmp_path / "got"))
        finally:
            os.environ.pop("SOURCE_DATE_EPOCH", None)
    with open(ref_dir / "train_loss.pdf", "rb") as f:
        want = f.read()
    with open(got_path, "rb") as f:
        got = f.read()
    assert got == want
