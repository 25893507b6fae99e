"""Chunked scoring dispatch: exactness, compile-cache reuse, edge cases.

scoring.common.frame_scores_chunked splits the frame axis into power-of-two
buckets so distinct clip lengths stop compiling fresh XLA graphs per scorer
(the reference's frame loop has no such cost; our jitted engines do). These
tests pin (a) bit-exact equality with the direct whole-clip call, (b) that
many clip lengths share one compiled shape, and (c) the empty-clip edge.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from poserisk_release_tpu.scoring.common import (
    SCORE_CHUNK_MAX,
    frame_scores_chunked,
    score_chunk_size,
)
from poserisk_release_tpu.scoring.reba import REBAScorer, pack_info, reba_frame_scores
from poserisk_release_tpu.scoring.rula import RULAScorer
from poserisk_release_tpu.scoring.rula import pack_info as rula_pack_info
from poserisk_release_tpu.scoring.rula import rula_frame_scores

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles

REBA_INFO = {"REBA": {
    "Legs_bilateral_weight_bearing/walking": 1, "Sitting": 0,
    "Load/Force Score": 1, "Arm_supported_leaning_L": 0,
    "Arm_supported_leaning_R": 1, "Coupling": 1, "Activity_Score": 1,
}}
RULA_INFO = {"RULA": {
    "Arm_supported_leaning_L": 0, "Arm_supported_leaning_R": 1,
    "A_Muscle_use_L": 1, "A_Muscle_use_R": 0, "A_Load/Force_L": 0,
    "A_Load/Force_R": 2, "Legs_bilateral_weight_bearing": 1,
    "B_Muscle_use": 1, "B_Load/Force": 0,
}}


def test_score_chunk_size_policy():
    assert score_chunk_size(1) == 32
    assert score_chunk_size(32) == 32
    assert score_chunk_size(33) == 64
    assert score_chunk_size(600) == 1024
    assert score_chunk_size(1024) == 1024
    assert score_chunk_size(5000) == SCORE_CHUNK_MAX
    assert score_chunk_size(0) == 32  # empty clips reuse the smallest bucket


@pytest.mark.parametrize("n_frames", [1, 31, 32, 33, 600, 1024, 1025, 2500])
def test_chunked_equals_direct_reba(n_frames):
    rng = np.random.RandomState(n_frames)
    poses = rng.uniform(-180, 180, size=(n_frames, 24, 3))
    info = pack_info(REBA_INFO)
    got = frame_scores_chunked(reba_frame_scores, poses, info)
    want = reba_frame_scores(
        jnp.asarray(poses.astype(np.float32)), jnp.asarray(info)
    )
    for key, arr in want.items():
        assert got[key].shape[0] == n_frames
        np.testing.assert_array_equal(got[key], np.asarray(arr), err_msg=key)


def test_chunked_equals_direct_rula():
    rng = np.random.RandomState(7)
    poses = rng.uniform(-180, 180, size=(1500, 24, 3))
    info = rula_pack_info(RULA_INFO)
    got = frame_scores_chunked(rula_frame_scores, poses, info)
    want = rula_frame_scores(
        jnp.asarray(poses.astype(np.float32)), jnp.asarray(info)
    )
    for key, arr in want.items():
        np.testing.assert_array_equal(got[key], np.asarray(arr), err_msg=key)


def test_many_lengths_share_one_compile():
    # Every length in (512, 1024] buckets to the same 1024-frame graph: the
    # jit cache must not grow as lengths vary (the production property this
    # change exists for -- one video library, zero per-clip recompiles).
    rng = np.random.RandomState(0)
    info = pack_info(REBA_INFO)
    frame_scores_chunked(
        reba_frame_scores, rng.uniform(-1, 1, (600, 24, 3)), info
    )
    size_after_first = reba_frame_scores._cache_size()
    for n_frames in (513, 700, 901, 1024):
        frame_scores_chunked(
            reba_frame_scores, rng.uniform(-1, 1, (n_frames, 24, 3)), info
        )
    assert reba_frame_scores._cache_size() == size_after_first


def test_empty_clip():
    got = frame_scores_chunked(
        reba_frame_scores, np.zeros((0, 24, 3)), pack_info(REBA_INFO)
    )
    assert all(arr.shape[0] == 0 for arr in got.values())
    assert REBAScorer()(np.zeros((0, 24, 3)), None, REBA_INFO) == []
    assert RULAScorer()(np.zeros((0, 24, 3)), None, RULA_INFO) == []
