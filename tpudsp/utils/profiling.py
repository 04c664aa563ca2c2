"""Tracing / profiling / observability (SURVEY.md section 5).

The reference's only observability is per-object stdout ``print()``
(resampler.hpp:101-103 etc.); here:

- ``annotate(name)``: jax.profiler trace annotation context for chain
  stages (shows up in TensorBoard / xprof traces).
- ``trace(path)``: capture a jax.profiler trace around a block of work.
- ``stage_report(...)``: host-side structured per-block metrics (rssi,
  squelch state counts, output levels) mirroring the reference's print
  surface but as data.
"""

from __future__ import annotations

import contextlib
import json
import sys

import numpy as np
import jax


def annotate(name: str):
    """Named trace annotation; also functions as a no-op context outside
    profiling sessions."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_report(name: str, *, out=None, modes=None, extra=None, file=sys.stderr):
    """Emit one structured JSON metrics line for a processed block."""
    rec = {"stage": name}
    if out is not None:
        o = np.asarray(out)
        power = float(np.mean(np.abs(o) ** 2)) if o.size else 0.0
        rec["out_rms"] = float(np.sqrt(power))
        rec["out_len"] = int(o.shape[-1]) if o.ndim else 0
    if modes is not None:
        m = np.asarray(modes)
        vals, counts = np.unique(m, return_counts=True)
        rec["squelch_modes"] = {int(v): int(c) for v, c in zip(vals, counts)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), file=file, flush=True)
    return rec
