"""Real SMPL-pkl asset path through SMPLFamily + profiling utilities."""

import pickle
import sys
import types

import numpy as np

from poserisk_release_tpu.body import smpl as body
from poserisk_release_tpu.utils.profiling import StageTimer, device_sync


def _write_fake_chumpy_pkl(arrays, path):
    fake = types.ModuleType("chumpy")
    fake_ch = types.ModuleType("chumpy.ch")

    class Ch:
        def __init__(self, x):
            self.x = x

    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    fake_ch.Ch = Ch
    fake.ch = fake_ch
    sys.modules["chumpy"] = fake
    sys.modules["chumpy.ch"] = fake_ch
    try:
        import scipy.sparse as sp

        payload = {
            "v_template": Ch(arrays["v_template"]),
            "shapedirs": Ch(arrays["shapedirs"]),
            "posedirs": Ch(arrays["posedirs"]),
            "J_regressor": sp.csc_matrix(arrays["J_regressor"]),
            "weights": Ch(arrays["weights"]),
            "kintree_table": np.stack([arrays["kintree_parents"], np.arange(24)]),
            "f": arrays["faces"],
            "betas": Ch(arrays["betas"]),
            "bs_type": "lrotmin",
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
    finally:
        del sys.modules["chumpy"]
        del sys.modules["chumpy.ch"]


def test_family_loads_real_pkl_assets(tmp_path):
    """SMPLFamily converts each gendered pkl and does NOT fall back to the
    synthetic model when real assets exist."""
    gendered = {}
    for i, gender in enumerate(("neutral", "male", "female")):
        arrays = body.synthetic_smpl_arrays(num_verts=60, seed=100 + i)
        _write_fake_chumpy_pkl(arrays, str(tmp_path / f"SMPL_{gender.upper()}.pkl"))
        gendered[gender] = arrays

    family = body.SMPLFamily(str(tmp_path), allow_synthetic=False)
    assert family.vertex_num == 60
    for gender, arrays in gendered.items():
        np.testing.assert_allclose(family[gender].v_template, arrays["v_template"])
    # The three genders are genuinely distinct models.
    assert not np.allclose(family["male"].v_template, family["female"].v_template)

    # Converted npz files were cached for future loads.
    for gender in gendered:
        assert (tmp_path / f"SMPL_{gender.upper()}.npz").exists()


def test_missing_assets_raise_when_synthetic_disallowed(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        body.SMPLModel.load(str(tmp_path), "neutral", allow_synthetic=False)


def test_stage_timer_report():
    import time

    timer = StageTimer()
    with timer.stage("decode"):
        time.sleep(0.01)
    with timer.stage("pose"):
        time.sleep(0.02)
    with timer.stage("pose"):
        time.sleep(0.005)
    report = timer.report()
    assert "decode" in report and "pose" in report and "total" in report
    assert timer.counts["pose"] == 2
    assert timer.acc["pose"] > timer.acc["decode"]


def test_device_sync_returns_checksum():
    import jax.numpy as jnp

    value = device_sync(jnp.ones((4, 4)), jnp.full((2,), 2.0))
    assert value == 20.0
