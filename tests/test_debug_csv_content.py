"""Golden-content checks for the debug CSV families (the parity fixtures).

SURVEY.md section 4: the reference's debug dumps are the de-facto
verification mechanism. These tests pin the exact cell strings: per-rule
angle logs ({x:.1f} formats, L/R layouts, quirk substitutions), per-joint
pose strings ({:.3f} triples), and score rows, independently recomputed in
the test from the raw pose values.
"""

import pytest
import csv
import os.path as osp

import numpy as np

from poserisk_release_tpu.outputs.writers import (
    pose_to_str,
    save_csv_pose_log,
    save_eval_pose_log_csv,
    save_score_log_csv,
)
from poserisk_release_tpu.scoring.reba import REBAScorer
from poserisk_release_tpu.scoring.rula import RULAScorer

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles

INFO = {
    "REBA": {
        "Legs_bilateral_weight_bearing/walking": 0, "Sitting": 0,
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


def _poses(rng, n=6):
    return rng.uniform(-120, 120, size=(n, 24, 3)).astype(np.float64)


def test_eval_pose_log_cell_content(rng, tmp_path):
    poses = _poses(rng)
    scorer = REBAScorer(debug=True)
    scorer(poses, None, INFO)
    frames = np.arange(len(poses))
    save_eval_pose_log_csv((0, frames, len(poses)), scorer.log, str(tmp_path), "REBA")

    with open(osp.join(str(tmp_path), "REBA_eval_pose_log.csv")) as f:
        rows = list(csv.reader(f))

    header = rows[0]
    assert header[2] == "trunk_bending"
    col = {name: i for i, name in enumerate(header)}
    for i, pose in enumerate(poses):
        row = rows[1 + i]
        torso = pose[3]
        assert row[col["trunk_bending"]] == f"{torso[0]:.1f}"
        assert row[col["trunk_twist"]] == f"{torso[1]:.1f}"
        neck = pose[12]
        assert row[col["neck_twist"]] == f"{neck[2]:.1f},{neck[1]:.1f}"
        lsh, rsh = pose[16], pose[17]
        assert row[col["upper_arm_bending"]] == (
            f"L {lsh[2]:.1f},{lsh[1]:.1f} R {rsh[2]:.1f},{rsh[1]:.1f}"
        )
        # Quirked log: L_Shoulder.y and R_Shoulder.z land in the R slot.
        assert row[col["upper_arm_abducted_rotated"]] == (
            f"L {lsh[2]:.1f},{lsh[0]:.1f} R {lsh[1]:.1f},{rsh[2]:.1f}"
        )
        lel, rel = pose[18], pose[19]
        assert row[col["lower_arm_bending"]] == (
            f"L {max(lel[1], lel[2]):.1f} R {max(rel[1], rel[2]):.1f}"
        )


def test_rula_eval_pose_log_overwrite_quirk(tmp_path):
    pose = np.zeros((1, 24, 3))
    pose[0, 17] = [7.0, 10.0, 50.0]  # R_Shoulder: z in (-70,110), |y|<20
    scorer = RULAScorer(debug=True)
    scorer(pose, None, INFO)
    save_eval_pose_log_csv((0, np.array([0]), 1), scorer.log, str(tmp_path), "RULA")
    with open(osp.join(str(tmp_path), "RULA_eval_pose_log.csv")) as f:
        rows = list(csv.reader(f))
    col = rows[0].index("upper_arm_bending")
    assert rows[1][col].endswith("R 50.0,1.0")  # angle4 := 1 (rula.py:183)


def test_pose_log_cell_content(rng, tmp_path):
    poses = _poses(rng, 4)
    pose_str = pose_to_str(poses)
    frames = np.array([0, 1, 3, 5])  # gap at 2 and 4
    joints_upper = [f"J{i}" for i in range(24)]
    joints_upper[12] = "NECK"
    save_csv_pose_log(pose_str, (0, frames, 6), ["Neck"], joints_upper, str(tmp_path))

    with open(osp.join(str(tmp_path), "pose_log.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Frame", "Joint Pose", "Neck"]
    # Frame 2 undetected: only the index.
    assert rows[3] == ["2"]
    # Frame 3 maps to track position 2.
    n = poses[2][12]
    assert rows[4] == ["3", "", f"({n[0]:.3f}, {n[1]:.3f}, {n[2]:.3f})"]


def test_score_log_cell_content(rng, tmp_path):
    poses = _poses(rng, 3)
    scorer = REBAScorer()
    results = scorer(poses, None, INFO)
    scores = np.array([r["score"] for r in results])
    logs = np.array([r["log_score"] for r in results], dtype=object)
    frames = np.arange(3)
    save_score_log_csv((0, frames, 3), scores, scorer.eval_items, logs, str(tmp_path), "REBA")

    with open(osp.join(str(tmp_path), "REBA_score_log.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Frame", "Final_score", "Joint Score"] + scorer.eval_items
    for i in range(3):
        assert rows[1 + i][0] == str(i)
        assert rows[1 + i][1] == str(results[i]["score"])
        assert rows[1 + i][3:] == [str(x) for x in results[i]["log_score"]]
