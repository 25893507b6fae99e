"""StreamSession smoke on the REAL chip: N camera sessions over one server.

Functional hardware proof of the per-stream serving surface
(serving.StreamSession + PoseScoringServer bucket ladder): synthetic
moving-person frames at the production ingest size (450x800) are pushed
through N concurrent sessions sharing one warm server; prints ONE JSON line
with per-request latency percentiles and the cross-stream batch fills.
Through this image's relay each request uploads ~1 MB (transport-bound,
like the round-4 serving smoke); the device-side floor for the same graph
is <3 ms/request (docs/PERF.md "Serving latency").

Knobs: SESS_STREAMS (3), SESS_FRAMES (24 per stream), SESS_STRIDE (4),
SESS_CPU=1 (debug on host).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import threading
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

N_STREAMS = int(os.environ.get("SESS_STREAMS", "3"))
N_FRAMES = int(os.environ.get("SESS_FRAMES", "24"))
STRIDE = int(os.environ.get("SESS_STRIDE", "4"))
HW = (450, 800)


class _ContentBoxDetector:
    """Deterministic bright-pixel box (no weights exist in this image)."""

    def __call__(self, frames_rgb):
        out = []
        for f in np.asarray(frames_rgb):
            ys, xs = np.where(f.mean(axis=2) > 100)
            if len(xs) < 10:
                out.append(np.zeros((0, 5), np.float32))
            else:
                out.append(np.asarray(
                    [[xs.min(), ys.min(), xs.max(), ys.max(), 0.9]],
                    np.float32))
        return out


def _frame(stream: int, i: int) -> np.ndarray:
    import cv2

    img = np.full((*HW, 3), 25, np.uint8)
    x = 60 + 40 * stream + 3 * i
    cv2.rectangle(img, (x, 90), (x + 160, 400), (190, 160, 140), -1)
    return img


def main() -> None:
    if os.environ.get("SESS_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from poserisk_release_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()

    from poserisk_release_tpu.serving import PoseScoringServer, StreamSession

    t0 = time.perf_counter()
    with PoseScoringServer(frame_hw=HW, batch_sizes=(1, 4, 16),
                           max_delay_ms=5.0) as server:
        t_warm = time.perf_counter() - t0
        sessions = [
            StreamSession(server, detector=_ContentBoxDetector(),
                          detection_stride=STRIDE, ring_capacity=64)
            for _ in range(N_STREAMS)
        ]
        futures = [[] for _ in range(N_STREAMS)]

        def feed(s: int) -> None:
            for i in range(N_FRAMES):
                futures[s].extend(sessions[s].push(_frame(s, i)))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=feed, args=(s,))
                   for s in range(N_STREAMS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [[(i, f.result(timeout=600)) for i, f in futs]
                   for futs in futures]
        elapsed = time.perf_counter() - t0
        stats = server.stats()

    n_scored = sum(len(r) for r in results)
    print(json.dumps({
        "metric": "stream_session_requests_per_sec",
        "value": round(n_scored / elapsed, 2),
        "unit": f"scored frames/sec wall, {N_STREAMS} sessions x {N_FRAMES} "
                f"frames, stride {STRIDE}, 450x800 (relay transport-bound)",
        "scored": n_scored,
        "pushed": N_STREAMS * N_FRAMES,
        "warm_sec": round(t_warm, 1),
        "elapsed_sec": round(elapsed, 2),
        "batches": stats["batches"],
        "cross_stream_fills": stats["batch_fill"][-8:],
        "latency_p50_ms": round(stats.get("latency_p50", 0) * 1e3, 1),
        "latency_p99_ms": round(stats.get("latency_p99", 0) * 1e3, 1),
        "per_stream_reba_head": [
            [r.reba for _, r in res[:5]] for res in results],
    }))


if __name__ == "__main__":
    main()
