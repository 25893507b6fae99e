"""Named unit tests for every SURVEY.md section 2.11 reference quirk.

The boundary sweeps in test_scoring.py cover these statistically; this file
documents each quirk as an explicit, individually-failing assertion so a
regression names the exact quirk it broke.
"""

import pytest
import numpy as np

from poserisk_release_tpu.scoring.reba import REBAScorer
from poserisk_release_tpu.scoring.rula import RULAScorer

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles

REBA_INFO = {"REBA": {
    "Legs_bilateral_weight_bearing/walking": 0, "Sitting": 0, "Load/Force Score": 0,
    "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0, "Coupling": 0,
    "Activity_Score": 0,
}}
RULA_INFO = {"RULA": {
    "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0,
    "A_Muscle_use_L": 0, "A_Muscle_use_R": 0, "A_Load/Force_L": 0,
    "A_Load/Force_R": 0, "Legs_bilateral_weight_bearing": 0,
    "B_Muscle_use": 0, "B_Load/Force": 0,
}}


def _reba_parts(pose):
    return REBAScorer()(pose[None], None, REBA_INFO)[0]["log_score"]


def _rula_parts(pose):
    return RULAScorer()(pose[None], None, RULA_INFO)[0]["log_score"]


def test_reba_trunk_side_bending_always_zero():
    """reba.py:150-156: both branches return 0 -- side bending never scores."""
    base = np.zeros((24, 3))
    bent = base.copy()
    bent[3, 2] = 85.0  # extreme Torso side bend
    assert _reba_parts(base)[0] == _reba_parts(bent)[0]


def test_reba_neck_over_20_scores_1_not_2():
    """reba.py:166-172: `elif angle<20 or angle<-5` can't catch angle >= 20,
    so extreme forward neck flexion falls through to the else (score 1)."""
    fwd = np.zeros((24, 3))
    fwd[12, 0] = 45.0  # Neck.x far beyond 20
    back = np.zeros((24, 3))
    back[12, 0] = -45.0  # backward: caught by the elif -> 2
    assert _reba_parts(fwd)[1] == 1
    assert _reba_parts(back)[1] == 2


def test_reba_trunk_exactly_20_scores_1():
    """reba.py:144-148: 20 deg sits in no interval (all strict) -> else 1."""
    pose = np.zeros((24, 3))
    pose[3, 0] = 20.0
    assert _reba_parts(pose)[0] == 1
    pose[3, 0] = 21.0
    assert _reba_parts(pose)[0] == 3


def test_reba_right_arm_outside_range_reads_left_angles():
    """reba.py:232-238: right upper-arm fallback branch tests the LEFT
    shoulder's angles."""
    pose = np.zeros((24, 3))
    pose[17, 2] = 150.0  # R_Shoulder.z outside (20, 110): fallback branch
    pose[16, 2] = 10.0  # L_Shoulder.z > -20 -> raised branch taken
    pose[16, 1] = 50.0  # LEFT y drives the right score: |50| >= 20 -> 2
    right_with_left_bent = int(_reba_parts(pose)[3].split(",")[1])
    pose[16, 1] = 0.0  # left y small -> 1
    right_with_left_straight = int(_reba_parts(pose)[3].split(",")[1])
    assert right_with_left_bent > right_with_left_straight


def test_reba_right_rotation_bonus_lands_on_left():
    """reba.py:331: |R_Shoulder.x| > 10 in the low-arm branch increments the
    LEFT abduction score."""
    base = np.zeros((24, 3))
    mod = base.copy()
    mod[17, 0] = 30.0  # R_Shoulder.x
    left0, right0 = map(int, _reba_parts(base)[3].split(","))
    left1, right1 = map(int, _reba_parts(mod)[3].split(","))
    assert (left1, right1) == (left0 + 1, right0)


def test_rula_right_arm_neutral_scores_zero_not_one():
    """rula.py:183: `angle4 = 1` assigns the angle, not the score, so a
    neutral right arm contributes 0 where the left contributes 1."""
    pose = np.zeros((24, 3))  # both arms neutral, z=0 in (-70, 110), |y|<20
    upper = _rula_parts(pose)[0]
    left, right = map(int, upper.split(","))
    assert left == right + 1  # identical posture, asymmetric score


def test_rula_upper_arm_raised_uses_AND_not_OR():
    """rula.py:171: the raised-arm chain tests `20 < y < 70` (AND), unlike
    REBA's all-covering OR -- y = 100 falls to the y > 70 branch (2), and
    y = -100 reaches the `<-70` branch (4)."""
    pose = np.zeros((24, 3))
    pose[16, 2] = 150.0  # L_Shoulder.z >= 110: the elif lz > -20 branch
    pose[16, 1] = -100.0
    assert int(_rula_parts(pose)[0].split(",")[0]) >= 4  # 4 + abducted bits


def test_rula_abducted_logs_left_y_in_right_slot():
    """rula.py:284: upper_arm_abducted logs angle2 (L_Shoulder.y) as R."""
    pose = np.zeros((24, 3))
    pose[16, 1] = 33.3
    pose[17, 2] = 55.0
    scorer = RULAScorer(debug=True)
    scorer(pose[None], None, RULA_INFO)
    assert scorer.log[0]["upper_arm_abducted"] == "L 0.0 R 33.3"


def test_lower_arm_sign_mirrored_thresholds():
    """reba.py:337-356: the left arm scores 1 in (-100, -60); the right arm
    in (60, 100) -- mirrored signs, max of Euler y/z."""
    pose = np.zeros((24, 3))
    pose[18, 1] = -80.0
    pose[18, 2] = -110.0  # max = -80 -> left 1
    pose[19, 1] = 80.0
    pose[19, 2] = -10.0  # max = 80 -> right 1
    assert _reba_parts(pose)[4] == "1,1"
    pose[18, 1] = -30.0  # max -30 in (-60, 0) -> 2
    pose[19, 1] = 30.0  # max 30 in (0, 60) -> 2
    assert _reba_parts(pose)[4] == "2,2"
