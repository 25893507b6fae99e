"""Integrated parity: full JAX pipeline vs a torch+cv2 reference restatement.

The SURVEY north star is score-identical REBA/RULA sequences. Component
parity is covered per-module; this test catches COMPOSITION bugs (color
order, crop coordinates, rotation conventions, scoring wiring) by running
the same weights through:

  reference path: cv2.warpAffine crops -> torch HMR -> cv2.Rodrigues ->
                  XYZ Euler -> frame-at-a-time scoring oracle
  TPU path:       ops.crop -> flax HMR (converted weights) -> jnp rotations
                  -> vectorised scorers

on the same synthetic clip and track. Crop resampling differs by cv2's 1/32
fixed-point interpolation, so angles can drift ~0.1 deg; frames whose angles
sit within 0.75 deg of a rule threshold are excluded from the exact-match
requirement, every other frame must score identically, and angles themselves
must agree tightly.
"""

import cv2
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from poserisk_release_tpu.models.convert import spin_state_dict_to_flax
from poserisk_release_tpu.models.spin import HMR, load_mean_params
from poserisk_release_tpu.ops.crop import crop_batch
from poserisk_release_tpu.ops.rotations import rotmat_to_euler_deg
from poserisk_release_tpu.scoring.reba import REBAScorer
from poserisk_release_tpu.scoring.rula import RULAScorer
from tests.oracles import reference_geometry, reference_scoring
from tests.oracles.torch_hmr import randomized_torch_hmr

INFO = {
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

def _synthetic_clip(n=10):
    frames = []
    for i in range(n):
        img = np.zeros((240, 320, 3), np.uint8)
        yy, xx = np.mgrid[0:240, 0:320]
        img[..., 0] = ((xx + 3 * i) % 256).astype(np.uint8)
        img[..., 1] = ((yy * 2) % 256).astype(np.uint8)
        img[..., 2] = ((xx // 2 + yy // 2) % 256).astype(np.uint8)
        cv2.rectangle(img, (120 + 2 * i, 50), (190 + 2 * i, 210), (210, 170, 140), -1)
        cv2.circle(img, (155 + 2 * i, 40), 18, (220, 190, 170), -1)
        frames.append(img)
    bboxes = np.array([[155 + 2 * i, 125, 170, 170] for i in range(n)], np.float32)
    return np.stack(frames), bboxes


def _reference_crop(image_rgb, bbox, scale=1.2, crop_size=224):
    c_x, c_y, bb_w, bb_h = bbox
    src_w, src_h = bb_w * scale, bb_h * scale
    src = np.array(
        [[c_x, c_y], [c_x, c_y + src_h * 0.5], [c_x + src_w * 0.5, c_y]], np.float32
    )
    half = crop_size * 0.5
    dst = np.array([[half, half], [half, 2 * half], [2 * half, half]], np.float32)
    trans = cv2.getAffineTransform(src, dst)
    patch = cv2.warpAffine(image_rgb, trans, (crop_size, crop_size),
                           flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    return patch.astype(np.float32) / 255.0


@pytest.fixture(scope="module")
def weights():
    mean = load_mean_params("")
    torch_model = randomized_torch_hmr(mean, seed=42)
    flax_vars = spin_state_dict_to_flax(dict(torch_model.state_dict()))
    return torch_model, flax_vars


def test_full_pipeline_score_parity(weights):
    torch_model, flax_vars = weights
    frames, bboxes = _synthetic_clip(10)

    # ---- reference path (torch + cv2 + per-frame oracles) -----------------
    ref_crops = np.stack([_reference_crop(f, b) for f, b in zip(frames, bboxes)])
    with torch.no_grad():
        t_rot, _, _ = torch_model(torch.from_numpy(np.transpose(ref_crops, (0, 3, 1, 2))))
    t_rot = t_rot.numpy()
    ref_euler = np.stack(
        [
            np.stack([
                reference_geometry.euler_from_rotmat_xyz(
                    reference_geometry.rodrigues_vec_to_mat(
                        reference_geometry.rodrigues_mat_to_vec(t_rot[i, j])
                    )
                ) * 180.0 / np.pi
                for j in range(24)
            ])
            for i in range(len(frames))
        ]
    )
    ref_reba = [reference_scoring.reba_frame(p, INFO["REBA"])[0] for p in ref_euler]
    ref_rula = [reference_scoring.rula_frame(p, INFO["RULA"])[0] for p in ref_euler]

    # ---- TPU path ----------------------------------------------------------
    crops = np.asarray(crop_batch(jnp.asarray(frames), jnp.asarray(bboxes), scale=1.2))
    rot, _, _ = HMR(n_iter=3).apply(flax_vars, jnp.asarray(crops))
    euler = np.asarray(rotmat_to_euler_deg(rot))
    jax_reba = [r["score"] for r in REBAScorer()(euler, None, INFO)]
    jax_rula = [r["score"] for r in RULAScorer()(euler, None, INFO)]

    # ---- compare ------------------------------------------------------------
    angle_err = np.abs(euler - ref_euler)
    # wrap-around at +-180
    angle_err = np.minimum(angle_err, 360 - angle_err)
    assert angle_err.max() < 0.75, f"angle drift {angle_err.max():.3f} deg"

    # A score mismatch is only excusable when the ORACLE itself flips between
    # the two angle sets (a genuine rule-threshold crossing inside the crop
    # interpolation tolerance); anything else is a composition bug.
    oracle_on_jax_reba = [reference_scoring.reba_frame(p, INFO["REBA"])[0] for p in euler]
    oracle_on_jax_rula = [reference_scoring.rula_frame(p, INFO["RULA"])[0] for p in euler]
    flips = 0
    for i in range(len(frames)):
        # Engine wiring: the vectorised scorer must equal the oracle on the
        # SAME angles, always.
        assert jax_reba[i] == oracle_on_jax_reba[i], f"REBA engine wiring, frame {i}"
        assert jax_rula[i] == oracle_on_jax_rula[i], f"RULA engine wiring, frame {i}"
        if oracle_on_jax_reba[i] == ref_reba[i] and oracle_on_jax_rula[i] == ref_rula[i]:
            assert jax_reba[i] == ref_reba[i] and jax_rula[i] == ref_rula[i]
        else:
            flips += 1
    # Sub-0.1-degree interpolation drift may flip a few threshold-straddling
    # frames, never most of the clip.
    assert flips <= len(frames) // 2, f"{flips} threshold flips of {len(frames)}"


def test_crop_pixel_agreement(weights):
    """Crop-level agreement feeding the parity above: mean |diff| well below
    a grey level, max bounded by cv2's fixed-point interpolation."""
    frames, bboxes = _synthetic_clip(4)
    ref = np.stack([_reference_crop(f, b) for f, b in zip(frames, bboxes)])
    got = np.asarray(crop_batch(jnp.asarray(frames), jnp.asarray(bboxes), scale=1.2))
    assert np.abs(got - ref).mean() < 0.003
    assert np.abs(got - ref).max() < 0.05
