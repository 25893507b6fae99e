"""bfloat16 fast-path sanity: outputs stay close to the f32 reference path."""

import numpy as np

import jax.numpy as jnp

from poserisk_release_tpu.models.detector import init_yolo_params, yolo_forward
from poserisk_release_tpu.models.spin import HMR, init_spin_params, load_mean_params


def test_hmr_bf16_close_to_f32(rng):
    import jax

    variables = init_spin_params(jax.random.PRNGKey(0), load_mean_params(""))
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 224, 224, 3)).astype(np.float32))
    rot32, shape32, cam32 = HMR(n_iter=3, dtype=jnp.float32).apply(variables, imgs)
    rot16, shape16, cam16 = HMR(n_iter=3, dtype=jnp.bfloat16).apply(variables, imgs)
    # Rotmats are unit-norm; bf16 backbone drift stays small and the outputs
    # are full f32 (head precision preserved).
    assert rot16.dtype == jnp.float32
    assert np.abs(np.asarray(rot16) - np.asarray(rot32)).max() < 0.15
    assert np.abs(np.asarray(shape16) - np.asarray(shape32)).max() < 0.5


def test_yolo_bf16_close_to_f32(rng):
    params = init_yolo_params(seed=0)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 416, 416, 3)).astype(np.float32))
    det32 = np.asarray(yolo_forward(params, x))
    det16 = np.asarray(yolo_forward(params, x, compute_dtype=jnp.bfloat16))
    assert det16.shape == det32.shape
    # With random (untrained) weights a few anchors have saturated logits in
    # the hundreds, where a bf16 ulp flips sigmoid 0 <-> 1; trained networks
    # are BN-normalised and don't do this. Assert distributional closeness:
    # essentially all anchors agree, and flips are vanishingly rare.
    diff = np.abs(det16[..., 4] - det32[..., 4])
    assert np.quantile(diff, 0.999) < 0.05
    assert (diff > 0.5).mean() < 1e-3


def test_bn_folding_matches_unfolded(rng):
    from poserisk_release_tpu.models.detector import fold_bn_params

    params = init_yolo_params(seed=0)
    folded = fold_bn_params(params)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 416, 416, 3)).astype(np.float32))
    a = np.asarray(yolo_forward(params, x))
    b = np.asarray(yolo_forward(folded, x))
    diff = np.abs(a[..., 4] - b[..., 4])
    # f32 folding is algebraically identical; only rounding differs (plus the
    # rare saturated-logit sigmoid flips of random weights).
    assert np.quantile(diff, 0.999) < 0.02
    assert (diff > 0.5).mean() < 1e-3
