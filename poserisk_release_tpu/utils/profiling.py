"""Tracing / profiling utilities (SURVEY.md section 5.1: the reference has an
unused timer class and tqdm only; here profiling is a first-class subsystem).

  * StageTimer -- accumulating named wall-clock stages (successor of the
    reference's `timer` class, funcs_utils.py:113-128, actually wired in).
  * trace() -- context manager around jax.profiler for on-TPU traces
    viewable in TensorBoard/Perfetto.
  * device_sync() -- a completion barrier that stays correct through remote
    relays where block_until_ready is unreliable: device-side reduce + 4-byte
    scalar readback.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self):
        self.acc: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.acc.values())
        lines = [f"{'stage':<16}{'sec':>10}{'calls':>8}{'share':>8}"]
        for name, sec in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            share = (sec / total * 100) if total else 0.0
            lines.append(f"{name:<16}{sec:>10.3f}{self.counts[name]:>8}{share:>7.1f}%")
        lines.append(f"{'total':<16}{total:>10.3f}")
        return "\n".join(lines)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache, shared by bench and tools.

    Remote-TPU relays in environments like this one compile each new jit
    signature in 40-90 s (tens of minutes for the fused full-frame step);
    the on-disk executable cache makes every later process that reuses a
    signature start in seconds. Harmless no-op where the backend does not
    support executable serialization. Default location: `.jax_cache_tpu/`
    at the repository root (next to bench.py) so bench.py and every tools/
    script share one cache; override with POSERISK_JAX_CACHE or the
    argument. Returns the directory used.
    """
    import os
    import os.path as osp

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("POSERISK_JAX_CACHE") or osp.join(
            osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
            ".jax_cache_tpu",
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (no-op fallback if profiling unavailable)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as exc:  # pragma: no cover - environment-specific
        print(f"[poserisk] profiler unavailable: {exc}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def device_sync(*arrays) -> float:
    """Force completion of device work feeding `arrays`; returns a checksum."""
    import jax.numpy as jnp

    acc = jnp.float32(0)
    for a in arrays:
        acc = acc + jnp.sum(a).astype(jnp.float32)
    return float(acc)
