"""Host-side video ingest: decode + the reference's resize rule, in memory.

The reference decodes with cv2.VideoCapture and round-trips EVERY frame
through a jpg on disk (/root/reference/lib/utils/funcs_utils.py:18-53,
SURVEY.md flags the jpg round-trip as a key bottleneck). Here frames stay in
one contiguous RGB ndarray feeding device batches directly; an optional
dump writes the reference-format '%09d.jpg' tree for debugging parity.

Resize rule parity (funcs_utils.py:26-31): if width > 800 scale to 800 wide,
elif height > 450 scale to 450 tall; always resize (even when unchanged).
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass

import numpy as np


def reference_resize_dims(width: int, height: int) -> tuple[int, int]:
    if width > 800:
        height = int(height * 800 / width)
        width = 800
    elif height > 450:
        width = int(width * 450 / height)
        height = 450
    return width, height


@dataclass
class VideoClip:
    frames: np.ndarray  # (N, H, W, 3) uint8 RGB
    fps: float

    @property
    def num_frames(self) -> int:
        return int(self.frames.shape[0])


def read_video(path: str, max_frames: int | None = None) -> VideoClip:
    """Decode a video to in-memory RGB frames with the reference resize rule."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS)
    src_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    src_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    width, height = reference_resize_dims(src_w, src_h)

    frames = []
    while True:
        ret, frame_bgr = cap.read()
        if not ret:
            break
        frame_bgr = cv2.resize(frame_bgr, (width, height))
        frames.append(cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB))
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"video decoded to zero frames: {path}")
    return VideoClip(frames=np.stack(frames), fps=float(fps))


def load_calibration_frames(path: str, n: int = 64) -> np.ndarray:
    """Load representative frames for int8 PTQ calibration
    (DetectorConfig.calibration). Accepts:

      * a video file -- decoded with the reference resize rule, then
        subsampled EVENLY to at most n frames (even coverage beats a prefix:
        the whole clip's exposure range informs the scales);
      * a directory of images (jpg/jpeg/png/bmp, sorted by name, first n),
        each resized by the same rule so canvas geometry matches the
        detector's ingest;
      * a .npy/.npz of (N, H, W, 3) uint8 RGB frames (first array in the
        npz), subsampled evenly to n.

    Returns (n', H, W, 3) uint8 RGB. Raises on empty/unreadable sources --
    silent mis-calibration is worse than a crash."""
    if path.endswith((".npy", ".npz")):
        data = np.load(path)
        frames = data[data.files[0]] if hasattr(data, "files") else data
        frames = np.asarray(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(
                f"calibration array must be (N, H, W, 3), got {frames.shape}")
        if frames.dtype != np.uint8:
            # Refuse to coerce: astype(uint8) on float [0,1] frames truncates
            # every pixel to 0 and the detector calibrates on black -- the
            # exact silent mis-calibration this loader exists to prevent.
            raise ValueError(
                "calibration array must be uint8 RGB (0..255), got "
                f"{frames.dtype}; convert explicitly (e.g. "
                "np.clip(x*255, 0, 255).astype(np.uint8) for [0,1] floats)")
        return _subsample(frames, n)
    if osp.isdir(path):
        import cv2

        names = sorted(
            f for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )[:n]
        if not names:
            raise ValueError(f"no images found in calibration dir: {path}")
        frames = []
        for name in names:
            bgr = cv2.imread(osp.join(path, name))
            if bgr is None:
                raise ValueError(f"unreadable calibration image: {name}")
            w, h = reference_resize_dims(bgr.shape[1], bgr.shape[0])
            bgr = cv2.resize(bgr, (w, h))
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        shapes = {f.shape for f in frames}
        if len(shapes) > 1:
            raise ValueError(
                f"calibration images resize to mixed shapes: {sorted(shapes)}")
        return np.stack(frames)
    clip = read_video(path)
    return _subsample(clip.frames, n)


def _subsample(frames: np.ndarray, n: int) -> np.ndarray:
    if len(frames) <= n:
        return frames
    idx = np.linspace(0, len(frames) - 1, n).round().astype(np.int64)
    return frames[idx]


def dump_frames(clip: VideoClip, tmp_path: str) -> int:
    """Write the reference-format '%09d.jpg' frame tree (debug parity only)."""
    import cv2

    os.makedirs(tmp_path, exist_ok=True)
    for idx, frame in enumerate(clip.frames):
        cv2.imwrite(
            osp.join(tmp_path, "{0:09d}.jpg".format(idx)),
            cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
        )
    return clip.num_frames


def jpeg_roundtrip(clip: VideoClip, tmp_path: str | None = None) -> VideoClip:
    """Round-trip every frame through JPEG, exactly as the reference computes.

    The reference writes each decoded frame to '{output}/tmp/%09d.jpg'
    (/root/reference/lib/utils/funcs_utils.py:42, cv2.imwrite defaults =
    quality 95) and re-reads the jpgs for BOTH detection and cropping
    (demo_dataset.py:59), so its SPIN inputs carry JPEG artifacts. This
    parity mode reproduces that: with tmp_path the frames take the identical
    disk route (written '%09d.jpg', read back, caller removes the tree like
    base.py:184); without it cv2.imencode/imdecode produce the same pixels
    in memory. Enabled via DatasetConfig.jpeg_ingest."""
    import cv2

    out = np.empty_like(clip.frames)
    if tmp_path is not None:
        n = dump_frames(clip, tmp_path)
        for idx in range(n):
            bgr = cv2.imread(osp.join(tmp_path, "{0:09d}.jpg".format(idx)))
            out[idx] = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    else:
        for idx, frame in enumerate(clip.frames):
            ok, buf = cv2.imencode(".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            if not ok:
                raise RuntimeError(f"jpeg encode failed for frame {idx}")
            out[idx] = cv2.cvtColor(cv2.imdecode(buf, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    return VideoClip(frames=out, fps=clip.fps)


def write_video(frames_bgr, fps: float, file_path: str) -> None:
    """mp4 writer with the reference's fourcc (0x7634706d, base.py:301)."""
    import cv2

    h, w = frames_bgr[0].shape[0], frames_bgr[0].shape[1]
    writer = cv2.VideoWriter(file_path, 0x7634706D, fps, (w, h))
    for frame in frames_bgr:
        writer.write(np.uint8(frame))
    writer.release()
