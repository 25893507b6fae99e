"""Offline dataset builder: videos -> per-person cropped jpg/mp4 corpora.

TPU-native rebuild of /root/reference/main/data_preprocessing.py:18-132: walk
a `videos/` tree, track every person, keep tracks of at least MIN_SEC
seconds, slice them into fixed-length chunks, crop each chunk to 224x224 on
device, and write per-person jpg folders (under `images/`) and mp4 clips
(under `processed_videos/`) -- same output naming scheme, no per-frame jpg
round trip on the input side (pass jpeg_ingest=True for the reference's
disk-JPEG pixel statistics, like DatasetConfig.jpeg_ingest).

Documented deviations from the literal tool (each pinned by execution in
tests/test_reference_differential_predictor.py):
  * the reference processes `sorted(dirs)[4:]` (data_preprocessing.py:33),
    silently skipping the first four source directories -- a leftover
    resume offset from its authors' run; this rebuild processes every dir;
  * the reference writes ROUNDED float pixels to the jpgs but TRUNCATED
    (np.uint8) pixels to the mp4s of the same crops
    (data_preprocessing.py:113-124); this rebuild writes one uint8 array to
    both surfaces.

Usage:
    python -m poserisk_release_tpu.tools.data_preprocessing --src data/NRF/videos/train
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
from typing import List

import numpy as np

MIN_SEC = 8
BBOX_SCALE = 1.2
CROP_BATCH = 256


def process_video(
    file_name: str, img_dir: str, processed_dir: str, tracker,
    crop_size: int = 224, jpeg_ingest: bool = False
) -> List[str]:
    """Track + chunk + crop one video. Returns the written mp4 paths."""
    import cv2
    import jax.numpy as jnp

    from poserisk_release_tpu.io.video import VideoClip, jpeg_roundtrip
    from poserisk_release_tpu.ops.crop import crop_batch

    save_dir = osp.splitext(osp.basename(file_name))[0]

    cap = cv2.VideoCapture(file_name)
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        return []
    clip = VideoClip(frames=np.stack(frames), fps=float(fps))
    if jpeg_ingest:
        # Reference pixel statistics: its tracker AND crops read the frames
        # back from a '%09d.jpg' tmp tree (data_preprocessing.py:59-66).
        clip = jpeg_roundtrip(clip)

    tracking_results = tracker(clip.frames)

    num_frames = int(MIN_SEC * clip.fps)
    chunks = []
    for person in tracking_results.values():
        if person["frames"].shape[0] < num_frames:
            continue
        n_batches = person["frames"].shape[0] // num_frames
        for b in range(n_batches):
            sl = slice(num_frames * b, num_frames * (b + 1))
            chunks.append({"bbox": person["bbox"][sl], "frames": person["frames"][sl]})

    written = []
    for person_id, chunk in enumerate(chunks):
        crops = []
        for start in range(0, chunk["frames"].shape[0], CROP_BATCH):
            sl = slice(start, start + CROP_BATCH)
            crops.append(
                np.asarray(
                    crop_batch(
                        jnp.asarray(clip.frames[chunk["frames"][sl]]),
                        jnp.asarray(chunk["bbox"][sl].astype(np.float32)),
                        scale=BBOX_SCALE,
                        out_size=crop_size,
                    )
                )
            )
        images = np.concatenate(crops)  # (N, S, S, 3) RGB [0,1]
        images_bgr = (images[:, :, :, ::-1] * 255).astype(np.uint8)

        save_img_path = osp.join(img_dir, save_dir, str(person_id))
        save_video_path = osp.join(processed_dir, f"{save_dir}_{person_id}.mp4")
        os.makedirs(save_img_path, exist_ok=True)
        os.makedirs(processed_dir, exist_ok=True)

        writer = cv2.VideoWriter(
            save_video_path, 0x7634706D, clip.fps, (crop_size, crop_size)
        )
        for frame_id in range(images_bgr.shape[0]):
            cv2.imwrite(
                osp.join(save_img_path, "{0:06d}.jpg".format(frame_id)),
                images_bgr[frame_id],
            )
            writer.write(images_bgr[frame_id])
        writer.release()
        written.append(save_video_path)
    return written


def main(src_dir: str, tracker=None, jpeg_ingest: bool = False) -> List[str]:
    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.models.detector import StubDetector, YoloDetector
    from poserisk_release_tpu.tracking.mpt import MultiPersonTracker

    if tracker is None:
        cfg = default_config()
        if osp.isfile(cfg.DETECTOR.weights):
            detector = YoloDetector.from_weights(cfg.DETECTOR.weights)
        else:
            print("[poserisk] no detector weights; using full-frame stub detector")
            detector = StubDetector()
        tracker = MultiPersonTracker(detector)

    written: List[str] = []
    for src_name in sorted(glob.glob(osp.join(src_dir, "*"))):
        if not osp.isdir(src_name):
            continue
        img_dir = src_name.replace("videos", "images")
        processed_dir = src_name.replace("videos", "processed_videos")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(processed_dir, exist_ok=True)

        file_names = sorted(
            glob.glob(osp.join(src_name, "*")) + glob.glob(osp.join(src_name, "**", "*"))
        )
        for file_name in file_names:
            if not osp.isfile(file_name):
                continue
            written += process_video(file_name, img_dir, processed_dir, tracker,
                                     jpeg_ingest=jpeg_ingest)
    return written


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Build per-person crop datasets")
    parser.add_argument("--src", type=str, required=True, help="videos/ source dir")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--jpeg_ingest", action="store_true",
                        help="round-trip frames through JPEG before tracking/"
                             "cropping (the reference's tmp-jpg pixel statistics)")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(args.src, jpeg_ingest=args.jpeg_ingest)
