"""Exhaustive parity tests: vectorised REBA/RULA engines vs frame-level oracle."""

import numpy as np
import pytest

from poserisk_release_tpu.scoring.reba import REBAScorer
from poserisk_release_tpu.scoring.rula import RULAScorer
from tests.oracles import reference_scoring as oracle

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles

# Angle values straddling every threshold in both rule sets.
BOUNDARY_VALUES = np.array(
    [
        -180.0, -120.0, -110.5, -110.0, -109.5, -100.5, -100.0, -99.5, -90.5,
        -90.0, -89.5, -70.5, -70.0, -69.5, -60.5, -60.0, -59.5, -45.5, -45.0,
        -44.5, -30.5, -30.0, -29.5, -20.5, -20.0, -19.5, -15.5, -15.0, -14.5,
        -10.5, -10.0, -9.5, -5.5, -5.0, -4.5, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0,
        1.5, 4.5, 5.0, 5.5, 9.5, 10.0, 10.5, 14.5, 15.0, 15.5, 19.5, 20.0,
        20.5, 29.5, 30.0, 30.5, 44.5, 45.0, 45.5, 59.5, 60.0, 60.5, 69.5,
        70.0, 70.5, 89.5, 90.0, 90.5, 99.5, 100.0, 100.5, 109.5, 110.0,
        110.5, 120.0, 180.0,
    ]
)

DEFAULT_REBA = {
    "Legs_bilateral_weight_bearing/walking": 0, "Sitting": 0, "Load/Force Score": 0,
    "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0, "Coupling": 0,
    "Activity_Score": 0,
}
DEFAULT_RULA = {
    "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 0,
    "A_Muscle_use_L": 0, "A_Muscle_use_R": 0, "A_Load/Force_L": 0,
    "A_Load/Force_R": 0, "Legs_bilateral_weight_bearing": 0,
    "B_Muscle_use": 0, "B_Load/Force": 0,
}
EXAMPLE_REBA = dict(DEFAULT_REBA, **{"Legs_bilateral_weight_bearing/walking": 1, "Sitting": 1})
NONZERO_REBA = dict(
    DEFAULT_REBA,
    **{
        "Legs_bilateral_weight_bearing/walking": 1, "Sitting": 1,
        "Load/Force Score": 2, "Arm_supported_leaning_L": 1, "Coupling": 1,
        "Activity_Score": 1,
    },
)
NONZERO_RULA = dict(
    DEFAULT_RULA,
    **{
        "Arm_supported_leaning_R": 1, "A_Muscle_use_L": 1, "A_Load/Force_R": 2,
        "Legs_bilateral_weight_bearing": 2, "B_Muscle_use": 1, "B_Load/Force": 1,
    },
)


def _poses(rng, n):
    """Half uniform-random, half boundary-valued poses."""
    uniform = rng.uniform(-180, 180, size=(n // 2, 24, 3))
    boundary = rng.choice(BOUNDARY_VALUES, size=(n - n // 2, 24, 3))
    return np.concatenate([uniform, boundary]).astype(np.float64)


@pytest.mark.parametrize("info", [DEFAULT_REBA, EXAMPLE_REBA, NONZERO_REBA])
def test_reba_matches_oracle(rng, info):
    poses = _poses(rng, 3000)
    add_info = {"REBA": info}
    got = REBAScorer(debug=False)(poses, None, add_info)
    for i, frame in enumerate(got):
        want_score, want_parts = oracle.reba_frame(poses[i], info)
        assert frame["score"] == want_score, f"frame {i}: {poses[i].tolist()}"
        got_parts = [
            frame["log_score"][0], frame["log_score"][1], frame["log_score"][2],
            *[int(x) for x in frame["log_score"][3].split(",")],
            *[int(x) for x in frame["log_score"][4].split(",")],
            *[int(x) for x in frame["log_score"][5].split(",")],
        ]
        want_flat = [
            want_parts[0], want_parts[1], want_parts[2],
            want_parts[3], want_parts[4], want_parts[5], want_parts[6],
            want_parts[7], want_parts[8],
        ]
        assert got_parts == want_flat, f"frame {i}"


@pytest.mark.parametrize("info", [DEFAULT_RULA, NONZERO_RULA])
def test_rula_matches_oracle(rng, info):
    poses = _poses(rng, 3000)
    add_info = {"RULA": info}
    got = RULAScorer(debug=False)(poses, None, add_info)
    for i, frame in enumerate(got):
        want_score, want_parts = oracle.rula_frame(poses[i], info)
        assert frame["score"] == want_score, f"frame {i}: {poses[i].tolist()}"
        got_parts = [
            *[int(x) for x in frame["log_score"][0].split(",")],
            *[int(x) for x in frame["log_score"][1].split(",")],
            *[int(x) for x in frame["log_score"][2].split(",")],
            *[int(x) for x in frame["log_score"][3].split(",")],
            frame["log_score"][4], frame["log_score"][5], frame["log_score"][6],
        ]
        assert got_parts == want_parts, f"frame {i}"


def test_reba_action_levels():
    assert REBAScorer.action_level(1) == (1, "Negligible risk")
    assert REBAScorer.action_level(2)[0] == 2
    assert REBAScorer.action_level(3)[0] == 2
    assert REBAScorer.action_level(5)[0] == 3
    assert REBAScorer.action_level(8)[0] == 4
    assert REBAScorer.action_level(10)[0] == 4
    assert REBAScorer.action_level(11)[0] == 5
    assert REBAScorer.action_level(12)[0] == 5
    # round() semantics: 4.4 -> 4 (level 3); 10.6 -> 11 (level 5)
    assert REBAScorer.action_level(4.4)[0] == 3
    assert REBAScorer.action_level(10.6)[0] == 5


def test_rula_action_levels():
    assert RULAScorer.action_level(1)[0] == 1
    assert RULAScorer.action_level(2)[0] == 1
    assert RULAScorer.action_level(3)[0] == 2
    assert RULAScorer.action_level(5)[0] == 3
    assert RULAScorer.action_level(7) == (4, "Investigate and implement change")
    assert RULAScorer.action_level(9)[0] == 4


def test_reba_debug_log_format(rng):
    poses = _poses(rng, 8)
    scorer = REBAScorer(debug=True)
    scorer(poses, None, {"REBA": DEFAULT_REBA})
    assert len(scorer.log) == 8
    keys = list(scorer.log[0].keys())
    assert keys == [
        "trunk_bending", "trunk_twist", "trunk_side_bending", "neck_bending",
        "neck_twist", "leg_bending", "upper_arm_bending", "shoulder_rise",
        "upper_arm_abducted_rotated", "lower_arm_bending", "wrist_bending",
        "wrist_side_bending_or_twisted",
    ]
    t = poses[0][3]
    assert scorer.log[0]["trunk_bending"] == f"{t[0]:.1f}"


def test_rula_debug_log_quirk_angle_overwrite():
    """rula.py:183 -- logged right-arm y angle becomes 1.0 when in-range."""
    pose = np.zeros((1, 24, 3))
    pose[0, 17] = [0.0, 5.0, 30.0]  # R_Shoulder: z=30 in (-70,110), |y|<20
    scorer = RULAScorer(debug=True)
    scorer(pose, None, {"RULA": DEFAULT_RULA})
    assert scorer.log[0]["upper_arm_bending"].endswith("R 30.0,1.0")

    pose[0, 17] = [0.0, 50.0, 30.0]  # |y| >= 20: logged verbatim
    scorer = RULAScorer(debug=True)
    scorer(pose, None, {"RULA": DEFAULT_RULA})
    assert scorer.log[0]["upper_arm_bending"].endswith("R 30.0,50.0")


def test_reba_quirk_right_rotation_bonus_lands_left():
    """reba.py:331 -- right-arm |x|>10 bonus increments the LEFT score."""
    base = np.zeros((1, 24, 3))
    # Left shoulder neutral-raised (z > -20) => left base = 1 + 1(bending=1...)
    # Right shoulder z < 20 with |x| > 10 triggers the misdirected bonus.
    with_bonus = base.copy()
    with_bonus[0, 17, 0] = 45.0  # R_Shoulder.x
    info = {"REBA": DEFAULT_REBA}
    got_base = REBAScorer()(base, None, info)[0]["log_score"][3]
    got_bonus = REBAScorer()(with_bonus, None, info)[0]["log_score"][3]
    l_base = int(got_base.split(",")[0])
    l_bonus = int(got_bonus.split(",")[0])
    r_base = int(got_base.split(",")[1])
    r_bonus = int(got_bonus.split(",")[1])
    assert l_bonus == l_base + 1  # left went up
    assert r_bonus == r_base  # right unchanged


def test_reba_matches_oracle_at_production_f32(rng):
    """The suite enables x64 globally; production runs f32. Sweep the engines
    with float32 poses (the engine computes in the input dtype) against the
    oracle evaluated on the SAME f32 values, covering the shipped precision."""
    poses64 = _poses(rng, 1500)
    poses32 = poses64.astype(np.float32)
    add_info = {"REBA": DEFAULT_REBA, "RULA": DEFAULT_RULA}
    got_reba = REBAScorer()(poses32, None, add_info)
    got_rula = RULAScorer()(poses32, None, add_info)
    from tests.oracles import reference_scoring as oracle

    for i in range(len(poses32)):
        p = poses32[i].astype(np.float64)  # exact f32 values, python-float math
        assert got_reba[i]["score"] == oracle.reba_frame(p, DEFAULT_REBA)[0], i
        assert got_rula[i]["score"] == oracle.rula_frame(p, DEFAULT_RULA)[0], i
