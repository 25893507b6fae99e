"""Parity tests for the model-parallel axes (tp / sp / pp / ep) + dp x tp
training, all on the virtual 8-device CPU mesh.

The reference is single-device (SURVEY.md section 2), so the oracle for
every axis is the repo's own replicated single-mesh step: identical scores,
float outputs within the collective reduction-order class documented in
docs/PARITY.md #8 (reduction reassociation moves conv accumulations by
~1e-3 deg at these magnitudes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from poserisk_release_tpu.body.smpl import SMPLFamily
from poserisk_release_tpu.config import default_config
from poserisk_release_tpu.models.spin import HMR
from poserisk_release_tpu.ops.lbs import joints_only_from_rotmats, smpl_params_to_jax
from poserisk_release_tpu.ops.rotations import axis_angle_to_rotmat_smpl
from poserisk_release_tpu.parallel.expert import (
    GENDERS,
    make_expert_joints,
    stack_expert_trees,
    stack_gender_experts,
)
from poserisk_release_tpu.parallel.pipeline import (
    balanced_split,
    hmr_stage_shapes,
    make_hmr_pipeline,
    make_hmr_pipeline_sharded,
)
from poserisk_release_tpu.parallel.spmd import (
    make_axes_mesh,
    spin_tp_specs,
    tp_step_shardings,
)
from poserisk_release_tpu.pipeline import PoseEstimator
from poserisk_release_tpu.throughput import default_packed_infos, make_pose_and_score_step


@pytest.fixture(scope="module")
def setup():
    cfg = default_config()
    family = SMPLFamily(cfg.SPIN.smpl_model_dir)
    est = PoseEstimator(cfg, family)
    step = make_pose_and_score_step(cfg.SPIN.ief_iters, est.parents,
                                    stem_s2d=cfg.SPIN.stem_s2d)
    ir, iu = default_packed_infos()
    rng = np.random.RandomState(7)
    crops = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    ref = jax.jit(step)(est.variables, est.smpl_params, crops,
                        jnp.asarray(ir), jnp.asarray(iu))
    return cfg, family, est, step, jnp.asarray(ir), jnp.asarray(iu), crops, \
        jax.tree_util.tree_map(np.asarray, ref)


def _run_sharded(setup, mesh, spatial_axis=None, data_axis="data"):
    _cfg, _family, est, step, ir, iu, crops, _ref = setup
    shardings, place = tp_step_shardings(
        mesh, est.variables, data_axis=data_axis,
        spatial_axis=spatial_axis)
    out = jax.jit(step, in_shardings=shardings)(
        place(est.variables),
        jax.device_put(est.smpl_params, NamedSharding(mesh, P())),
        jax.device_put(crops, shardings[2]),
        jax.device_put(ir, shardings[3]), jax.device_put(iu, shardings[4]))
    return jax.tree_util.tree_map(np.asarray, out)


def _assert_step_parity(ref, out):
    reba, rula, euler, joint = out
    np.testing.assert_array_equal(ref[0], reba)
    np.testing.assert_array_equal(ref[1], rula)
    assert np.max(np.abs(ref[2].astype(np.float64) - euler)) < 0.05
    assert np.max(np.abs(ref[3].astype(np.float64) - joint)) < 0.05


def test_tensor_parallel_pose_step(setup):
    """Megatron-sharded HMR params over ('data', 'model') == replicated run."""
    mesh = make_axes_mesh({"data": 2, "model": 4})
    _assert_step_parity(setup[-1], _run_sharded(setup, mesh))


def test_tp_specs_cover_tree(setup):
    """Every backbone conv kernel / BN vector actually shards on 'model'."""
    est = setup[2]
    specs = spin_tp_specs(est.variables)
    leaves = jax.tree_util.tree_leaves_with_path(specs)
    backbone = [(p, s) for p, s in leaves
                if "backbone" in [getattr(k, "key", "") for k in p]]
    assert backbone and all("model" in (s or ()) for _, s in backbone)


def test_spatial_partition_pose_step(setup):
    """Crop HEIGHT axis sharded over 'spatial' (GSPMD conv halo exchange)."""
    mesh = make_axes_mesh({"data": 2, "spatial": 4})
    _assert_step_parity(setup[-1],
                        _run_sharded(setup, mesh, spatial_axis="spatial"))


def test_pipeline_parallel_hmr(setup):
    """4-stage GPipe schedule over 'stage' == monolithic HMR.apply."""
    _cfg, _family, est, _step, _ir, _iu, crops, _ref = setup
    want = jax.tree_util.tree_map(
        np.asarray, HMR(n_iter=3).apply(est.variables, crops))
    mesh = make_axes_mesh({"stage": 4})
    pipe = jax.jit(make_hmr_pipeline(mesh, hw=64,
                                     microbatch=2, n_microbatches=4))
    got = jax.tree_util.tree_map(np.asarray, pipe(est.variables, crops))
    for w, g in zip(want, got):
        np.testing.assert_allclose(w, g, atol=5e-5)


def test_pipeline_parallel_with_data_axis(setup):
    """dp x pp: batch sharded over 'data', stages over 'stage'."""
    _cfg, _family, est, _step, _ir, _iu, crops, _ref = setup
    want = jax.tree_util.tree_map(
        np.asarray, HMR(n_iter=3).apply(est.variables, crops))
    mesh = make_axes_mesh({"data": 2, "stage": 4})
    pipe = jax.jit(make_hmr_pipeline(mesh, hw=64,
                                     microbatch=2, n_microbatches=2,
                                     data_axis="data"))
    got = jax.tree_util.tree_map(np.asarray, pipe(est.variables, crops))
    for w, g in zip(want, got):
        np.testing.assert_allclose(w, g, atol=5e-5)


def test_stage_shapes_contract():
    assert hmr_stage_shapes(64) == ((64, 64, 3), (16, 16, 256),
                                    (8, 8, 512), (4, 4, 1024))


def test_pipeline_stage_sharded_params_memory_and_parity(setup):
    """The pp MEMORY story: with the stage-sharded placement each device's
    addressable parameter bytes are ~total/4 (balanced block split), and the
    outputs still match the monolithic HMR.apply."""
    _cfg, _family, est, _step, _ir, _iu, crops, _ref = setup
    mesh = make_axes_mesh({"stage": 4})
    fn, place, split = make_hmr_pipeline_sharded(
        mesh, est.variables, hw=64, microbatch=2, n_microbatches=4)
    assert split == balanced_split(est.variables, 4)
    buf = place(est.variables)

    total = sum(np.size(l) * np.dtype(l.dtype).itemsize
                for l in jax.tree_util.tree_leaves(est.variables))
    per_dev = max(s.data.nbytes for s in buf.addressable_shards)
    # Replicated placement would be ratio 1.0; the balanced block split of
    # ResNet-50+head measures 0.294 (block granularity bounds it below by
    # the largest single bottleneck block, ~0.22).
    assert per_dev < 0.31 * total, (per_dev, total)

    want = jax.tree_util.tree_map(
        np.asarray, HMR(n_iter=3).apply(est.variables, crops))
    got = jax.tree_util.tree_map(np.asarray, jax.jit(fn)(buf, crops))
    for w, g in zip(want, got):
        np.testing.assert_allclose(w, g, atol=5e-5)


# --- config-driven product path (ParallelConfig axes) ----------------------

def _est(setup, parallel):
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg, family, *_ = setup
    return PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8, **parallel}),
        family)


def _frames_case(seed=0, n=16):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, (n, 64, 96, 3)).astype(np.uint8)
    boxes = (np.tile(np.array([48.0, 32.0, 24.0, 24.0], np.float32), (n, 1))
             + rng.rand(n, 4).astype(np.float32))
    return frames, np.arange(n), boxes


@pytest.mark.parametrize("parallel,atol", [
    ({"model": 4, "num_devices": 2}, 5e-3),       # dp x tp
    ({"spatial": 4, "num_devices": 2}, 5e-3),     # dp x sp
    ({"stage": 4, "num_devices": 2,
      "stage_microbatches": 2}, 1e-3),            # dp x pp (stage-sharded)
    ({"expert": 4, "num_devices": 2}, 1e-3),      # dp x ep
])
def test_config_driven_estimator_matches_single_device(setup, parallel, atol):
    """PoseEstimator builds the N-D mesh and placements from ParallelConfig
    alone (the product path: cfg/CLI-reachable, no bespoke harness code) and
    matches the single-device estimator within the collective
    reduction-order class."""
    cfg, family, *_ = setup
    base = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8}), family)
    frames, ids, boxes = _frames_case()
    ref = base.run_from_frames(frames, ids, boxes)

    est = _est(setup, parallel)
    assert est.mesh is not None
    assert dict(est.mesh.shape)["data"] == 2
    out = est.run_from_frames(frames, ids, boxes)
    for r, o in zip(ref[:2], out[:2]):
        np.testing.assert_allclose(r.astype(np.float64), o, atol=atol)


def test_config_pp_composes_with_pose_stride(setup):
    """Pipeline parallelism under SpinConfig.pose_stride: production_chunk
    folds stage_microbatches into the quantum, so the anchor batch always
    splits evenly into microbatches, and outputs still cover every frame."""
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg, family, *_ = setup
    frames, ids, boxes = _frames_case(seed=2, n=16)
    base = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8},
                    SPIN={"pose_stride": 2}), family)
    # Same chunk (16) on both sides: chunk boundaries decide which frames
    # HOLD their anchor's pose (PARITY 5b), so differing chunks would diff
    # by that documented class, not a pp defect.
    ref = base.run_from_frames(frames, ids, boxes, chunk=16)
    est = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8, "stage": 4,
                              "num_devices": 2, "stage_microbatches": 2},
                    SPIN={"pose_stride": 2}), family)
    assert est.production_chunk() % (2 * 2 * 2) == 0
    out = est.run_from_frames(frames, ids, boxes)
    assert out[0].shape == ref[0].shape == (16, 24, 3)
    np.testing.assert_allclose(ref[0].astype(np.float64), out[0], atol=1e-3)
    np.testing.assert_allclose(ref[1].astype(np.float64), out[1], atol=1e-3)


def test_config_tp_composes_with_bf16_fast(setup):
    """Megatron tp sharding composes with the bf16 fast mode: the cast
    tree shards leaf-for-leaf (specs are dtype-agnostic), and results stay
    within the bf16 path's own noise class vs the single-device fast run."""
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg, family, *_ = setup
    frames, ids, boxes = _frames_case(seed=3, n=8)
    base = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8}), family, fast=True)
    ref = base.run_from_frames(frames, ids, boxes)
    est = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8, "model": 4,
                              "num_devices": 2}), family, fast=True)
    import jax.numpy as jnp

    assert est.variables["params"]["backbone"]["conv1"]["kernel"].dtype == jnp.bfloat16
    out = est.run_from_frames(frames, ids, boxes)
    # bf16 conv accumulations under 4-way resharding: coarser class than
    # f32 tp, amplified by random weights (measured: median 0.06 deg,
    # p99 0.93, max 4.2 on this seed).
    d = np.abs(ref[0].astype(np.float64) - out[0])
    assert np.median(d) < 0.5 and np.percentile(d, 99) < 5.0, (
        np.median(d), np.percentile(d, 99))


def test_config_ep_gender_switch_routes_to_expert(setup):
    """set_gender under expert parallelism flips only the routing scalar;
    joints must equal the single-device estimator built FOR that gender."""
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg, family, *_ = setup
    frames, ids, boxes = _frames_case(seed=5, n=8)
    est = _est(setup, {"expert": 4, "num_devices": 2})
    est.set_gender("male")
    out = est.run_from_frames(frames, ids, boxes)
    ref = PoseEstimator(
        cfg.replace(MODEL={"input_shape": (64, 64)},
                    PARALLEL={"frames_per_step": 8}),
        family, gender="male").run_from_frames(frames, ids, boxes)
    np.testing.assert_allclose(ref[1].astype(np.float64), out[1], atol=1e-3)
    with pytest.raises(ValueError):
        est.set_gender("unknown")


@pytest.mark.smoke
def test_parallel_config_validation(setup):
    """Invalid axis combinations fail loudly at construction, not mid-run."""
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.pipeline import PoseEstimator

    cfg, family, *_ = setup
    with pytest.raises(ValueError, match="expert"):
        default_config().replace(PARALLEL={"expert": 2})
    with pytest.raises(ValueError, match="must be >= 1"):
        default_config().replace(PARALLEL={"model": 0})
    with pytest.raises(ValueError, match="cannot combine"):
        PoseEstimator(
            cfg.replace(PARALLEL={"stage": 4, "model": 2, "num_devices": 1}),
            family)
    with pytest.raises(ValueError, match="spin_int8"):
        PoseEstimator(
            cfg.replace(PARALLEL={"model": 4, "num_devices": 2}),
            family, spin_int8=True)


@pytest.mark.smoke
def test_mesh_from_config_shapes(setup):
    """num_devices=0 gives the data axis all devices left over after the
    model axes; no axes + one device means no mesh at all."""
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.parallel.spmd import mesh_from_config

    pcfg = default_config().replace(PARALLEL={"model": 4}).PARALLEL
    mesh = mesh_from_config(pcfg)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    pcfg = default_config().replace(
        PARALLEL={"num_devices": 1}).PARALLEL
    assert mesh_from_config(pcfg) is None


@pytest.mark.smoke
def test_expert_parallel_gender_routing(setup):
    """Gendered SMPL tables sharded as experts; dense-dispatch routing
    matches per-gender serial joints. Experts are perturbed per slot so a
    routing error is observable (the synthetic fallback gives every gender
    identical tables)."""
    _cfg, family, est, *_ = setup
    rng = np.random.RandomState(3)
    trees = []
    for i, g in enumerate(GENDERS):
        t = dict(smpl_params_to_jax(family[g]))
        t["v_template"] = t["v_template"] * (1.0 + 0.05 * i)
        trees.append(t)
    rot = axis_angle_to_rotmat_smpl(
        jnp.asarray(rng.randn(8, 24, 3).astype(np.float32) * 0.2))
    gid = jnp.asarray(rng.randint(0, 3, size=8), jnp.int32)
    want = np.stack([
        np.asarray(joints_only_from_rotmats(
            trees[int(g)], rot[i:i + 1], est.parents))[0]
        for i, g in enumerate(np.asarray(gid))])

    for axes, data_axis in (({"expert": 4}, None),
                            ({"data": 2, "expert": 4}, "data")):
        mesh = make_axes_mesh(axes)
        stacked = stack_expert_trees(trees, mesh)
        fn = jax.jit(make_expert_joints(mesh, est.parents,
                                        data_axis=data_axis))
        got = np.asarray(fn(stacked, rot, gid))
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.smoke
def test_stack_gender_experts_placement(setup):
    """The stacked gender tree shards its leading axis over 'expert'."""
    _cfg, family, *_ = setup
    mesh = make_axes_mesh({"expert": 4})
    stacked = stack_gender_experts(family, mesh)
    leaf = stacked["v_template"]
    assert leaf.shape[0] == 4  # 3 genders + 1 neutral pad
    assert leaf.sharding.spec[0] == "expert"


def test_train_step_tensor_parallel(setup):
    """One dp x tp training step matches the single-device step: same loss,
    same updated params (within reduction-order tolerance).

    SGD so the update is LINEAR in the gradient: Adam's first-step
    mu/sqrt(nu) is sign-like, turning ~1e-6 reduction-order gradient noise
    near zero into full +-lr update flips (measured 1.9e-3 on 3/9408
    elements of a conv kernel) — an optimizer property, not a sharding
    defect."""
    from poserisk_release_tpu.train.step import TrainState

    cfg, family, *_ = setup
    rng = np.random.RandomState(11)
    crops = rng.rand(8, 64, 64, 3).astype(np.float32)
    targets = rng.randn(8, 24, 3).astype(np.float32) * 0.1

    base = TrainState.create(cfg, family, remat=False, lr=1e-3,
                             optimizer_name="sgd")
    base2, loss_ref = base.step(crops, targets)

    mesh = make_axes_mesh({"data": 2, "model": 4})
    tp = TrainState.create(cfg, family, remat=False, lr=1e-3,
                           optimizer_name="sgd", mesh=mesh)
    # params must actually be model-sharded before the step
    fc1 = tp.params["fc1"]["kernel"]
    assert "model" in (fc1.sharding.spec[1] or ())
    tp2, loss_tp = tp.step(crops, targets)

    np.testing.assert_allclose(loss_ref, loss_tp, rtol=1e-4)
    ref_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, base2.params))
    tp_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, tp2.params))
    for a, b in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(a, b, atol=5e-4)
