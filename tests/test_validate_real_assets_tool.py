"""End-to-end exercise of tools/validate_real_assets.py with synthetic
'real' assets (a torch-saved SPIN checkpoint + darknet weights), so the
round-3 playbook's non-skip code paths are proven runnable before real
assets exist. Runs the tool as a subprocess (it is a script, not package
code)."""

import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_assets(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from poserisk_release_tpu.models.detector import conv_indices, init_yolo_params
    from poserisk_release_tpu.models.spin import load_mean_params
    from poserisk_release_tpu.config import default_config
    from tests.oracles.torch_hmr import randomized_torch_hmr

    root = tmp_path_factory.mktemp("assets")
    ckpt = root / "model_checkpoint.pt"
    mean = load_mean_params(default_config().SPIN.smpl_mean_params)
    torch.save({"model": randomized_torch_hmr(mean, seed=3).state_dict()},
               str(ckpt))

    # darknet binary from random-init params (same layout as the loader test)
    params = init_yolo_params(seed=0)
    chunks = [np.zeros(5, np.int32).tobytes()]
    for i in conv_indices():
        layer = params[f"conv_{i}"]
        if "scale" in layer:
            for name in ("bias", "scale", "mean", "var"):
                chunks.append(np.asarray(layer[name], np.float32).tobytes())
        else:
            chunks.append(np.asarray(layer["conv_bias"], np.float32).tobytes())
        chunks.append(
            np.transpose(np.asarray(layer["kernel"]), (3, 2, 0, 1))
            .astype(np.float32).tobytes()
        )
    weights = root / "yolov3.weights"
    weights.write_bytes(b"".join(chunks))
    return str(ckpt), str(weights)


def test_tool_runs_spin_and_yolo_sections(synthetic_assets):
    ckpt, weights = synthetic_assets
    out = subprocess.run(
        [sys.executable, "tools/validate_real_assets.py", "--cpu",
         "--ckpt", ckpt, "--weights", weights,
         "--img_size", "64", "--probe_hw", "96", "128"],
        capture_output=True, text=True, timeout=1500, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "torch-vs-flax (REAL weights)" in out.stdout
    assert "--fast (bf16)" in out.stdout
    assert "--spin_int8 (bias-corrected)" in out.stdout
    assert "detections at thr 0.1" in out.stdout
    assert "done." in out.stdout
    # converted checkpoint must match the torch oracle tightly (f32)
    import re

    m = re.search(r"torch-vs-flax \(REAL weights\): angle drift median ([0-9.]+)",
                  out.stdout)
    assert m and float(m.group(1)) < 0.1, out.stdout
