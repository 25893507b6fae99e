"""Long-clip --streaming soak on the REAL TPU (BASELINE config 5 evidence).

All streaming/serving parity runs on the virtual CPU mesh; the chip had only
seen bench.py's synthetic step and one serving smoke. This tool drives the
production long-video surface on hardware: a >= 10k-frame synthetic clip
through the two-pass StreamingScorer (the --streaming CLI path's engine),
recording wall-clock throughput, peak host RSS (the bounded-memory claim),
and the scored-frame count. Prints ONE JSON line.

Environment caveat (docs/PERF.md round 5): through this image's remote-TPU
relay, bulk transfers run ~4 MB/s, so the recorded fps is a LOWER bound
dominated by uint8 frame upload (pass 2 ships every tracked frame). On a
directly attached chip the same path is decode-bound instead
(tools/bench_e2e.py measures the stage split). Host RSS is relay-independent.

Knobs: SOAK_FRAMES (default 10240), SOAK_H/SOAK_W (default 180x320 -- the
stack is resolution-polymorphic; the default keeps relay upload ~10 min),
SOAK_WINDOW (256), SOAK_FAST=1 (bf16 SPIN), SOAK_CPU=1 (debug on host).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

FRAMES = int(os.environ.get("SOAK_FRAMES", "10240"))
H = int(os.environ.get("SOAK_H", "180"))
W = int(os.environ.get("SOAK_W", "320"))
WINDOW = int(os.environ.get("SOAK_WINDOW", "256"))
FAST = os.environ.get("SOAK_FAST", "1") == "1"


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


class _PeakRss:
    def __init__(self, period: float = 0.05):
        self.period = period
        self.peak = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _rss_mb())
            time.sleep(self.period)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)


def make_clip(path: str, n_frames: int) -> None:
    import cv2

    from poserisk_release_tpu.io.video import write_video

    fourcc = 0x7634706D
    writer = cv2.VideoWriter(path, fourcc, 30.0, (W, H))
    if not writer.isOpened():  # pragma: no cover - codec-dependent
        # Fall back to the package helper (it picks a working fourcc).
        frames = []
        for i in range(n_frames):
            frames.append(_frame(i))
        write_video(frames, fps=30.0, file_path=path)
        return
    for i in range(n_frames):
        writer.write(_frame(i)[:, :, ::-1])
    writer.release()


def _frame(i: int) -> np.ndarray:
    import cv2

    img = np.full((H, W, 3), 30, np.uint8)
    x = int(W * 0.15) + (i % max(1, W // 3))
    cv2.rectangle(img, (x, H // 8), (x + W // 4, H - H // 8),
                  (180, 150, 130), -1)
    return img


def main() -> None:
    if os.environ.get("SOAK_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from poserisk_release_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    import json as _json

    from poserisk_release_tpu.config import default_config
    from poserisk_release_tpu.pipeline import build_detector
    from poserisk_release_tpu.streaming import StreamingScorer

    cfg = default_config()
    info = _json.load(open(cfg.DATASET.default_information))

    tmpdir = tempfile.mkdtemp(prefix="poserisk_soak_")
    clip = osp.join(tmpdir, "soak.mp4")
    t0 = time.perf_counter()
    make_clip(clip, FRAMES)
    t_write = time.perf_counter() - t0
    clip_mb = osp.getsize(clip) / 1e6
    decoded_mb = FRAMES * H * W * 3 / 1e6

    scorer = StreamingScorer(cfg=cfg, detector=build_detector(cfg),
                             window=WINDOW, fast=FAST)
    rss_before = _rss_mb()
    with _PeakRss() as rss:
        t0 = time.perf_counter()
        result = scorer(clip, info)
        elapsed = time.perf_counter() - t0
    out = {
        "metric": "streaming_soak_fps",
        "value": round(FRAMES / elapsed, 2),
        "unit": f"frames/sec wall-clock, two-pass --streaming, {H}x{W}, "
                f"window {WINDOW}{', bf16' if FAST else ''} "
                "(relay-bound lower bound in this environment)",
        "frames": FRAMES,
        "frames_scored": len(result.frames),
        "elapsed_sec": round(elapsed, 1),
        "clip_write_sec": round(t_write, 1),
        "clip_mb": round(clip_mb, 1),
        "decoded_clip_mb": round(decoded_mb, 1),
        "rss_before_mb": round(rss_before, 1),
        "rss_peak_mb": round(rss.peak, 1),
        "rss_growth_mb": round(rss.peak - rss_before, 1),
        "reba_stats": [float(x) for x in result.stats("reba")],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
