"""CLI entry point, flag-compatible with the reference's main/run.py.

    python -m poserisk_release_tpu.cli --type REBA,RULA --input video.mp4 \
        --info additional_information.json --output out [--gpu 0] \
        [--visualize] [--debug] [--debug_joints "Neck,L_Hip"] [--debug_frame K]

Flags and defaults mirror /root/reference/main/run.py:10-20. `--gpu` is
accepted for reference compatibility but has no device-selection effect
(JAX owns device enumeration; use --num_devices / --cpu). `--cpu` forces
the host platform (useful on machines without TPU).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Estimate RULA and REBA score")
    parser.add_argument("--gpu", type=str, default="0",
                        help="accepted for reference-CLI compatibility; device "
                             "selection uses --num_devices / --cpu instead")
    parser.add_argument("--type", type=str, default="REBA,RULA", help="Score type")
    parser.add_argument("--input", type=str, default="example/input.mp4",
                        help="input video, or a directory of videos (each is "
                             "scored into <output>/<video-stem>/ by ONE warm "
                             "Predictor -- compiles are paid once)")
    parser.add_argument("--info", type=str, default="example/additional_information.json",
                        help="input additional_information.json")
    parser.add_argument("--output", type=str, default="output", help="output directory")
    parser.add_argument("--visualize", type=bool, default=True, help="do result visualization")
    parser.add_argument("--no_visualize", action="store_true",
                        help="disable annotated-video rendering. The "
                             "reference's type=bool --visualize quirk makes "
                             "'--visualize False' parse as True (any "
                             "non-empty string is truthy; preserved for "
                             "parity -- '--visualize \"\"' also disables), "
                             "so this is the real off-switch, essential for "
                             "--streaming where rendering forces a full-clip "
                             "decode + per-frame cv2 composition")
    parser.add_argument("--debug", action="store_true", help="for debuging")
    parser.add_argument("--debug_joints", type=str, default="",
                        help='for debuging, input joint names (i.e. "Neck,L_Hip")')
    parser.add_argument("--debug_frame", type=int, default=-1,
                        help="for debuging, input frame number")
    parser.add_argument("--cfg", type=str, default=None, help="YAML config override")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--gender", type=str, default="neutral",
                        choices=("neutral", "male", "female"),
                        help="SMPL body model used for joint positions/mesh")
    parser.add_argument("--multi_person", action="store_true",
                        help="score every tracked person (one output dir each)")
    parser.add_argument("--profile", action="store_true",
                        help="print per-stage wall-clock report after the run")
    parser.add_argument("--fast", action="store_true",
                        help="bfloat16 SPIN backbone (4.2x pose step; <0.1 deg angle drift)")
    parser.add_argument("--spin_int8", action="store_true",
                        help="int8 PTQ SPIN backbone (calibrated + bias-"
                             "corrected on the first crop batch; ~0.17 deg "
                             "median angle drift -- docs/PERF.md)")
    parser.add_argument("--fast_detector", action="store_true",
                        help="rect canvas + int8 PTQ detector (2.1x; see "
                             "docs/PARITY.md for the quantified deviations)")
    parser.add_argument("--detection_stride", type=int, default=1,
                        help="detect only every Nth frame and interpolate "
                             "track boxes across the gaps (throughput mode; "
                             "1 = reference detect-every-frame contract)")
    parser.add_argument("--adaptive_stride", action="store_true",
                        help="motion-adaptive upgrade of --detection_stride "
                             "(its value becomes the MAX interval): "
                             "intervals whose boxes move probe their "
                             "midpoint and bisect until linear "
                             "interpolation is accurate, so detections "
                             "concentrate at reversals/entrances while "
                             "static scenes cost the fixed stride")
    parser.add_argument("--pose_stride", type=int, default=1,
                        help="run crop+SPIN only on every Nth tracked frame "
                             "and slerp-interpolate the skipped frames' joint "
                             "rotations (throughput mode; 1 = reference "
                             "pose-every-frame contract)")
    parser.add_argument("--calibration", type=str, default="",
                        help="explicit int8 calibration source (video file, "
                             "image dir, or .npy/.npz of frames) for the "
                             "--fast_detector / --spin_int8 paths; scales are "
                             "derived from it BEFORE the input video, so an "
                             "unrepresentative opening window cannot pin them")
    parser.add_argument("--calibration_frames", type=int, default=64,
                        help="frames drawn evenly from the calibration source")
    parser.add_argument("--recalibrate_per_video", action="store_true",
                        help="re-derive int8 scales at the start of every "
                             "video (shared-Predictor lifecycle)")
    parser.add_argument("--jpeg_ingest", action="store_true",
                        help="reference-parity ingest: route frames through "
                             "the %%09d.jpg disk round trip before detection")
    parser.add_argument("--validate_rotations", action="store_true",
                        help="host-side euler round-trip guard mirroring the "
                             "reference's coord_utils assert")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="devices in the data mesh (0 = all visible; "
                             "with model-parallel axes set, 0 = all devices "
                             "left over after those axes)")
    parser.add_argument("--tp", type=int, default=1, metavar="N",
                        help="tensor parallelism: Megatron-shard the SPIN "
                             "parameter tree over an N-wide 'model' mesh "
                             "axis (PARALLEL.model)")
    parser.add_argument("--sp", type=int, default=1, metavar="N",
                        help="spatial partitioning: shard the crop HEIGHT "
                             "axis over an N-wide 'spatial' mesh axis; XLA "
                             "inserts the conv halo exchanges "
                             "(PARALLEL.spatial)")
    parser.add_argument("--pp", type=int, default=1, metavar="N",
                        help="pipeline parallelism: GPipe-schedule the SPIN "
                             "forward over an N-stage parameter-balanced "
                             "block split, each device holding only its "
                             "stage's parameters (PARALLEL.stage; see also "
                             "--pp_microbatches)")
    parser.add_argument("--pp_microbatches", type=int, default=4,
                        help="microbatches per chunk under --pp "
                             "(PARALLEL.stage_microbatches)")
    parser.add_argument("--ep", type=int, default=1, metavar="N",
                        help="expert parallelism: shard the gendered SMPL "
                             "tables one-per-device-row with dense-dispatch "
                             "routing (PARALLEL.expert, >= 3); pairs with "
                             "--person_genders")
    parser.add_argument("--person_genders", type=str, default="",
                        help="per-track SMPL genders for --multi_person, "
                             "e.g. '1:male,3:female' (person ids from the "
                             "tracker; unlisted tracks use --gender)")
    parser.add_argument("--streaming", action="store_true",
                        help="bounded-memory long-video mode: two-pass "
                             "reference-consistent target selection, peak "
                             "host memory ~2 windows of frames; writes the "
                             "result txts/plots and (with --visualize, the "
                             "default) the annotated REBA/RULA videos, "
                             "rendered incrementally window by window")
    parser.add_argument("--streaming_window", type=int, default=256,
                        help="frames per streaming window")
    parser.add_argument("--decode_workers", type=int, default=1,
                        help="video-decode threads (window-aligned segments, "
                             "bit-identical frames to serial decode via "
                             "guarded seek; 1 = serial). Decode is the "
                             "production wall-clock bottleneck at the device "
                             "pipeline's throughput")
    return parser


VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def resolve_mesh(cfg, num_devices: int):
    """THE one config-vs-legacy mesh decision for both CLI paths: with
    model axes configured, return None (PoseEstimator builds the N-D mesh
    from cfg.PARALLEL itself); otherwise build the legacy 1-D data mesh
    from --num_devices. Prints the device line either way."""
    import jax

    from poserisk_release_tpu.parallel.mesh import make_mesh
    from poserisk_release_tpu.parallel.spmd import model_axes_from_config

    if model_axes_from_config(cfg.PARALLEL):
        print("Work on devices: ", jax.devices())
        return None
    n_devices = num_devices or len(jax.devices())
    print("Work on devices: ", jax.devices()[: n_devices or None])
    return make_mesh(n_devices) if n_devices > 1 else None


def parse_person_genders(spec: str) -> dict:
    """'1:male,3:female' -> {1: 'male', 3: 'female'} (Predictor validates
    the gender names)."""
    out = {}
    for item in filter(None, (s.strip() for s in spec.split(","))):
        pid, sep, gender = item.partition(":")
        if not sep or not pid.strip().isdigit() or not gender.strip():
            raise ValueError(
                f"--person_genders entry {item!r} is not '<id>:<gender>'")
        out[int(pid)] = gender.strip()
    return out


def input_videos(path: str):
    """[(video_path, output_subdir | None)] for --input: a single file maps
    to the output dir itself (reference behaviour); a directory maps each
    contained video to <output>/<stem>/ in sorted order."""
    import os
    import os.path as osp

    if not osp.isdir(path):
        return [(path, None)]
    vids = sorted(
        name for name in os.listdir(path)
        if name.lower().endswith(VIDEO_EXTS)
    )
    if not vids:
        raise ValueError(f"no video files ({'/'.join(VIDEO_EXTS)}) in {path}")
    # Extension-stripped stems can collide (demo.mp4 + demo.mov) and would
    # silently overwrite each other's result files; colliding entries keep
    # their extension in the subdir name instead (demo_mp4, demo_mov). That
    # rename can itself collide with another video's unique stem
    # (demo.mp4 -> demo_mp4 vs demo_mp4.avi), so every candidate is checked
    # against the names already assigned, falling back to the full-name
    # rename and then a numeric suffix -- two runs can never share a subdir.
    from collections import Counter

    stems = Counter(osp.splitext(name)[0] for name in vids)
    used: set = set()
    pairs = []
    for name in vids:
        stem = osp.splitext(name)[0]
        cand = stem if stems[stem] == 1 else name.replace(".", "_")
        if cand in used:
            cand = name.replace(".", "_")
        base, n = cand, 2
        while cand in used:
            cand = f"{base}_{n}"
            n += 1
        used.add(cand)
        pairs.append((osp.join(path, name), cand))
    return pairs


def profile_report(timings: dict) -> str:
    """--profile stage table. Dotted keys (score.device, score.render) are
    sub-intervals of their parent stage, so they are EXCLUDED from the total
    (summing them would double-count their parent's window) and rendered
    indented beneath it; every share is relative to the top-level total."""
    total = sum(sec for stage, sec in timings.items() if "." not in stage)

    def row(label: str, sec: float, indent: str = "") -> str:
        share = sec / total * 100 if total else 0.0
        return f"{indent + label:<16} {sec:8.3f}s {share:5.1f}%"

    lines = ["", "----- Stage timings -----"]
    for parent in sorted((k for k in timings if "." not in k),
                         key=lambda k: -timings[k]):
        lines.append(row(parent, timings[parent]))
        for sub in sorted(k for k in timings
                          if k.startswith(parent + ".")):
            lines.append(row(sub, timings[sub], indent="  "))
    lines.append(row("total", total))
    return "\n".join(lines)


def run_streaming(args, cfg) -> int:
    """--streaming entry: StreamingScorer with the Predictor's detector
    policy, info fallback, and int8 calibration lifecycle, emitting
    reference-format result files."""
    from poserisk_release_tpu.outputs.stats import print_result_summary
    from poserisk_release_tpu.pipeline import (
        apply_explicit_calibration,
        build_detector,
        load_add_info,
    )
    from poserisk_release_tpu.streaming import StreamingScorer

    for flag in ("profile", "debug"):
        if getattr(args, flag):
            print(f"[streaming] --{flag} is ignored in streaming mode "
                  "(use the batch path for stage timings / debug dumps)")
    mesh = resolve_mesh(cfg, args.num_devices)
    scorer = StreamingScorer(
        cfg=cfg,
        detector=build_detector(cfg),
        window=args.streaming_window,
        mesh=mesh,
        fast=args.fast,
        spin_int8=args.spin_int8,
        gender=args.gender,
        validate_rotations=args.validate_rotations,
    )
    # Same explicit-calibration lifecycle as the batch Predictor: an
    # operator-supplied --calibration source derives the int8 scales before
    # the first video window can pin them implicitly.
    apply_explicit_calibration(cfg, scorer.detector, scorer.estimator)
    import os.path as osp

    add_info = load_add_info(cfg, args.info)
    for video, subdir in input_videos(args.input):
        out = osp.join(args.output, subdir) if subdir else args.output
        if args.multi_person:
            # Same per-person layout as the batch --multi_person extension:
            # one person_<id>/ directory per surviving track (annotated
            # videos included when --visualize, rendered incrementally).
            per_person = scorer.score_all(
                video, add_info,
                video_output=out if args.visualize else None,
                video_types=args.type)
            if not per_person:
                # Match the batch --multi_person contract (pipeline.py
                # raises the same message): a clip with nobody tracked must
                # not exit 0 having silently written nothing.
                raise ValueError("no person tracks found in the clip")
            for pid, res in per_person.items():
                person_out = osp.join(out, f"person_{pid}")
                summary = scorer.write_outputs(res, person_out,
                                               score_type=args.type)
                print(f"\n\n===> DONE! (streaming, person {pid})")
                print("Result files saved in ", person_out)
                print_result_summary(summary)
            continue
        # Reference --visualize semantics (type=bool quirk: any non-empty
        # string is True): render the annotated videos incrementally during
        # pass 2 -- the one batch output streaming used to have to skip.
        result = scorer(video, add_info,
                        video_output=out if args.visualize else None,
                        video_types=args.type)
        summary = scorer.write_outputs(result, out, score_type=args.type)
        print("\n\n===> DONE! (streaming)")
        print("Result files saved in ", out)
        print_result_summary(summary)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.no_visualize:
        # Normalise once so every downstream consumer (Predictor,
        # run_streaming) sees one boolean; keeps the quirky --visualize
        # surface untouched for reference parity.
        args.visualize = False

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from poserisk_release_tpu.config import default_config, load_yaml_config
    from poserisk_release_tpu.pipeline import Predictor

    cfg = load_yaml_config(args.cfg) if args.cfg else default_config()
    if args.fast_detector:
        cfg = cfg.replace(DETECTOR={"rect_letterbox": True, "int8": True})
    if args.jpeg_ingest:
        cfg = cfg.replace(DATASET={"jpeg_ingest": True})
    if args.detection_stride != 1 or args.adaptive_stride:
        cfg = cfg.replace(DETECTOR={
            "detection_stride": args.detection_stride,
            "adaptive_stride": args.adaptive_stride,
        })
    if args.pose_stride != 1:
        cfg = cfg.replace(SPIN={"pose_stride": args.pose_stride})
    if args.decode_workers != 1:
        cfg = cfg.replace(DATASET={"decode_workers": args.decode_workers})
    if args.calibration or args.recalibrate_per_video:
        cfg = cfg.replace(DETECTOR={
            "calibration": args.calibration,
            "calibration_frames": args.calibration_frames,
            "recalibrate_per_video": args.recalibrate_per_video,
        })
    par_axes = {"model": args.tp, "spatial": args.sp, "stage": args.pp,
                "expert": args.ep}
    par_axes = {k: v for k, v in par_axes.items() if v != 1}
    if par_axes:
        if args.pp != 1:
            par_axes["stage_microbatches"] = args.pp_microbatches
        # num_devices becomes the DATA axis size of the N-D mesh the
        # PoseEstimator builds from config (parallel.spmd.mesh_from_config).
        cfg = cfg.replace(PARALLEL={**par_axes,
                                    "num_devices": args.num_devices})

    if args.streaming:
        return run_streaming(args, cfg)

    mesh = resolve_mesh(cfg, args.num_devices)

    predictor = Predictor(
        cfg=cfg,
        score_type=args.type,
        debug=args.debug,
        debug_joints=args.debug_joints,
        debug_frame=args.debug_frame,
        visualize=args.visualize,
        mesh=mesh,
        gender=args.gender,
        multi_person=args.multi_person,
        person_genders=parse_person_genders(args.person_genders),
        fast=args.fast,
        spin_int8=args.spin_int8,
        validate_rotations=args.validate_rotations,
    )
    import os.path as osp

    for video, subdir in input_videos(args.input):
        out = osp.join(args.output, subdir) if subdir else args.output
        if subdir:
            print(f"\n===> {video} -> {out}")
        predictor(video, args.info, out)
        if args.profile:
            print(profile_report(predictor.timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
