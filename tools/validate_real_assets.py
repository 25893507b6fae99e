"""Real-asset validation playbook (run the moment real assets appear).

No real SMPL pkl / SPIN checkpoint / YOLO weights / demo video exist in
this image (the reference's data/base_data is a broken symlink), so every
numeric-parity result so far is proven against synthetic/random-weight
oracles (docs/PARITY.md). This tool operationalises the round-3 step
STATUS.md defers: given real assets at the configured paths (or via
flags), it runs the parity harnesses that matter and prints the measured
drifts plus a recommendation for each opt-in fast path. Sections skip
gracefully when their asset is absent, so the tool is safe to run anywhere.

  1. SMPL pkl dir   cfg.SPIN.smpl_model_dir  -> loader + LBS sanity
  2. SPIN ckpt      cfg.SPIN.checkpoint      -> torch-vs-flax rotmat/angle
                    drift on real weights, then bf16 and int8(+bias-corr)
                    drift -- the data for deciding --fast/--spin_int8
  3. YOLO weights   cfg.DETECTOR.weights     -> f32/bf16/int8 + rect-canvas
                    score drift and box agreement at the 0.1 threshold --
                    the data for deciding --fast_detector
  4. demo video     --video PATH             -> full Predictor strict vs
                    all-fast score-sequence diff
  5. demo video     --video PATH             -> pose-stride score flips:
                    strict vs pose_stride 2/4 with everything else strict
                    (isolates the slerp interpolation's effect on real
                    motion -- the one deviation random weights cannot
                    bound; docs/PARITY.md #5b) -- the data for deciding
                    BENCH_POSE_STRIDE / --pose_stride

Usage: python tools/validate_real_assets.py [--video demo.mp4] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def section(title: str):
    print(f"\n=== {title} " + "=" * max(0, 58 - len(title)), flush=True)


def skip(msg: str):
    print(f"  SKIP: {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None, help="real demo video (optional)")
    ap.add_argument("--smpl_dir", default=None, help="override SMPL pkl dir")
    ap.add_argument("--ckpt", default=None, help="override SPIN checkpoint path")
    ap.add_argument("--weights", default=None, help="override YOLO weights path")
    ap.add_argument("--img_size", type=int, default=None,
                    help="override detector canvas (testing: small canvases "
                         "compile fast off-TPU)")
    ap.add_argument("--probe_hw", type=int, nargs=2, default=(450, 800),
                    help="synthetic probe frame size for the detector section")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from poserisk_release_tpu.config import default_config

    cfg = default_config()
    if args.smpl_dir:
        cfg = cfg.replace(SPIN={"smpl_model_dir": args.smpl_dir})
    if args.ckpt:
        cfg = cfg.replace(SPIN={"checkpoint": args.ckpt})
    if args.weights:
        cfg = cfg.replace(DETECTOR={"weights": args.weights})
    rng = np.random.RandomState(0)

    # ------------------------------------------------------------------ SMPL
    section("1. SMPL human-model assets")
    pkls = []
    if osp.isdir(cfg.SPIN.smpl_model_dir):
        import glob

        pkls = sorted(glob.glob(osp.join(cfg.SPIN.smpl_model_dir, "*.pkl")))
    if not pkls:
        skip(f"no .pkl files under {cfg.SPIN.smpl_model_dir}")
    else:
        from poserisk_release_tpu.body.smpl import SMPLFamily
        from poserisk_release_tpu.ops.lbs import LBS

        family = SMPLFamily(cfg.SPIN.smpl_model_dir, allow_synthetic=False)
        for gender in ("neutral", "male", "female"):
            model = family[gender]
            pose = np.zeros((2, 72), np.float32)
            pose[:, 0] = 3.14
            verts, joints = LBS(model)(pose)
            print(f"  {gender}: verts {verts.shape} joints {joints.shape} "
                  f"finite={np.isfinite(np.asarray(verts)).all()}", flush=True)
        print("  -> real pkl loading OK; debug-mesh exports now reference-"
              "comparable (outputs/writers.save_obj)", flush=True)

    # ------------------------------------------------------------------ SPIN
    section("2. SPIN checkpoint: torch-vs-flax + fast-path drift")
    if not osp.isfile(cfg.SPIN.checkpoint):
        skip(f"no checkpoint at {cfg.SPIN.checkpoint}")
    else:
        import torch

        from poserisk_release_tpu.models.spin import (
            HMR, cast_backbone_params, load_mean_params, quantize_spin_backbone,
        )
        from poserisk_release_tpu.ops.rotations import rotmat_to_euler_deg
        from poserisk_release_tpu.pipeline import load_spin_variables

        # THE conversion path the Predictor uses (incl. the .flax.npz cache)
        variables = load_spin_variables(cfg)
        mean = load_mean_params(cfg.SPIN.smpl_mean_params)
        crops = jnp.asarray(rng.rand(8, 224, 224, 3).astype(np.float32))

        model = HMR(n_iter=cfg.SPIN.ief_iters)
        r_f32, _, _ = jax.jit(model.apply)(variables, crops)
        e_f32 = np.asarray(rotmat_to_euler_deg(r_f32))

        try:
            from tests.oracles.torch_hmr import TorchHMR

            tm = TorchHMR(mean)
            state = torch.load(cfg.SPIN.checkpoint, map_location="cpu")
            sd = state.get("model", state)
            missing, unexpected = tm.load_state_dict(
                {k.replace("module.", ""): v for k, v in sd.items()}, strict=False
            )
            n_loaded = len(sd) - len(unexpected)
            if n_loaded == 0:
                # strict=False would silently leave the oracle at random
                # init and print a garbage "real-weights drift".
                raise RuntimeError(
                    "torch oracle matched ZERO checkpoint keys -- naming "
                    f"scheme differs (sample: {sorted(sd)[:3]})")
            if missing or unexpected:
                print(f"  (oracle load: {n_loaded} keys matched, "
                      f"{len(missing)} missing, {len(unexpected)} unexpected)",
                      flush=True)
            tm.eval()
            with torch.no_grad():
                r_t, _, _ = tm(torch.from_numpy(
                    np.asarray(crops, np.float32).transpose(0, 3, 1, 2)
                ))
            e_t = np.asarray(rotmat_to_euler_deg(jnp.asarray(r_t.numpy())))
            d = np.abs(e_f32 - e_t)
            d = np.minimum(d, 360.0 - d)
            print(f"  torch-vs-flax (REAL weights): angle drift median "
                  f"{np.median(d):.4f} p95 {np.percentile(d, 95):.4f} "
                  f"max {d.max():.4f} deg", flush=True)
        except Exception as exc:  # oracle import / naming mismatch
            print(f"  torch oracle comparison unavailable: {exc}", flush=True)

        def drift(label, r_other):
            e = np.asarray(rotmat_to_euler_deg(r_other))
            d = np.abs(e - e_f32)
            d = np.minimum(d, 360.0 - d)
            rec = "OK to enable" if np.percentile(d, 95) < 0.5 else "measure score flips first"
            print(f"  {label}: median {np.median(d):.4f} p95 "
                  f"{np.percentile(d, 95):.4f} max {d.max():.4f} deg -> {rec}",
                  flush=True)

        bf16_vars = cast_backbone_params(variables)
        r_bf16, _, _ = jax.jit(HMR(n_iter=cfg.SPIN.ief_iters, dtype=jnp.bfloat16).apply)(
            bf16_vars, crops
        )
        drift("--fast (bf16)", r_bf16)

        quant = quantize_spin_backbone(variables, crops[:4])
        from poserisk_release_tpu.models.spin import hmr_forward_quant

        r_q, _, _ = jax.jit(
            lambda q, v, c: hmr_forward_quant(q, v, c, cfg.SPIN.ief_iters, jnp.float32)
        )(quant, variables, crops)
        drift("--spin_int8 (bias-corrected)", r_q)

    # ------------------------------------------------------------------ YOLO
    section("3. YOLO darknet weights: fast-detector drift")
    if not osp.isfile(cfg.DETECTOR.weights):
        skip(f"no weights at {cfg.DETECTOR.weights}")
    else:
        from poserisk_release_tpu.models.detector import (
            YoloDetector, fold_bn_params, load_darknet_weights,
        )

        folded = fold_bn_params(load_darknet_weights(cfg.DETECTOR.weights))
        H, W = args.probe_hw
        frames = rng.randint(0, 255, (8, H, W, 3)).astype(np.uint8)
        if args.video and osp.isfile(args.video):
            from poserisk_release_tpu.io.video import read_video

            clip = read_video(args.video)
            frames = clip.frames[:8]
        img_size = args.img_size or cfg.DETECTOR.img_size
        strict = YoloDetector(params=folded, img_size=img_size,
                              max_device_dets=0)(frames)
        fast = YoloDetector(params=dict(folded), img_size=img_size,
                            rect=True, int8=True, batch_size=8)
        fast.calibrate(frames)
        fast_out = fast(frames)
        n_s = sum(len(r) for r in strict)
        n_f = sum(len(r) for r in fast_out)
        print(f"  detections at thr 0.1: strict {n_s} vs rect+int8 {n_f} "
              f"over {len(frames)} frames", flush=True)
        if n_s:
            matched = 0
            for s, f in zip(strict, fast_out):
                for box in s:
                    if len(f) and np.min(np.abs(f[:, :4] - box[:4]).max(axis=1)) < 5.0:
                        matched += 1
            print(f"  box agreement (<5 px): {matched}/{n_s} -> "
                  f"{'OK to enable --fast_detector' if matched == n_s else 'inspect disagreements'}",
                  flush=True)

    # ----------------------------------------------------------------- video
    section("4. Demo video: strict vs all-fast score sequences")
    strict_rows = {}  # {csv basename: rows} -- section 5's stride-1 baseline
    if not (args.video and osp.isfile(args.video)):
        skip("no --video given (pass the reference demo clip)")
    else:
        import tempfile

        from poserisk_release_tpu.pipeline import Predictor

        import glob as _glob

        info = cfg.DATASET.default_information
        with tempfile.TemporaryDirectory() as td:
            strict = Predictor(cfg=cfg, visualize=False, debug=True)
            s = strict(args.video, info, osp.join(td, "strict"))
            strict_rows = {
                osp.basename(c): open(c).read().splitlines()
                for c in _glob.glob(osp.join(td, "strict", "debug",
                                             "*score_log.csv"))
            }
            fastp = Predictor(cfg=cfg.replace(DETECTOR={"rect_letterbox": True,
                                                        "int8": True}),
                              visualize=False, debug=True,
                              fast=True, spin_int8=True)
            f = fastp(args.video, info, osp.join(td, "fast"))
            for kind in ("REBA", "RULA"):
                if kind in s and kind in f:
                    print(f"  {kind} stats strict:   {s[kind][0]} "
                          f"(action level {s[kind][1]})", flush=True)
                    print(f"  {kind} stats all-fast: {f[kind][0]} "
                          f"(action level {f[kind][1]})", flush=True)
            # per-frame flips from the debug score logs (parity fixtures)
            for csv_s in sorted(_glob.glob(osp.join(td, "strict", "debug",
                                                    "*score_log.csv"))):
                csv_f = csv_s.replace(osp.join(td, "strict"), osp.join(td, "fast"))
                if not osp.isfile(csv_f):
                    continue
                rows_s = open(csv_s).read().splitlines()
                rows_f = open(csv_f).read().splitlines()
                # Positional zip would silently drop tail rows when the two
                # runs tracked different frame counts -- count those as
                # disagreements (they ARE fast-path deviations).
                n = max(len(rows_s), len(rows_f))
                flips = sum(
                    1 for i in range(n)
                    if (rows_s[i] if i < len(rows_s) else None)
                    != (rows_f[i] if i < len(rows_f) else None)
                )
                print(f"  {osp.basename(csv_s)}: {flips}/{n} "
                      f"differing per-frame rows strict vs all-fast", flush=True)

    # ----------------------------------------------------------- pose stride
    section("5. Demo video: pose-stride score flips (strict otherwise)")
    if not strict_rows:
        skip("needs --video (reuses section 4's strict run as the stride-1 "
             "baseline)")
    else:
        import glob as _glob
        import tempfile

        from poserisk_release_tpu.pipeline import Predictor

        info = cfg.DATASET.default_information
        with tempfile.TemporaryDirectory() as td:
            for stride in (2, 4):
                p = Predictor(cfg=cfg.replace(SPIN={"pose_stride": stride}),
                              visualize=False, debug=True)
                p(args.video, info, osp.join(td, f"s{stride}"))
                rows_by_name = {
                    osp.basename(c): open(c).read().splitlines()
                    for c in _glob.glob(
                        osp.join(td, f"s{stride}", "debug", "*score_log.csv"))
                }
                for name, rows_1 in strict_rows.items():
                    rows_s = rows_by_name.get(name)
                    if rows_s is None:
                        continue
                    n = max(len(rows_1), len(rows_s))
                    flips = sum(
                        1 for i in range(n)
                        if (rows_1[i] if i < len(rows_1) else None)
                        != (rows_s[i] if i < len(rows_s) else None)
                    )
                    verdict = ("OK to enable" if flips / max(n, 1) < 0.02
                               else "inspect flips before enabling")
                    print(f"  pose_stride {stride} {name}: {flips}/{n} "
                          f"differing per-frame rows vs stride 1 -> {verdict}",
                          flush=True)

    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
