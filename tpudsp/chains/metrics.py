"""Per-block chain metrics (SURVEY.md section 5 "metrics/observability").

The reference exposes loop internals only as readable properties polled
between blocks (AGC.level_dB/rssi agc.hpp:53-55, status agc.hpp:89-91, NCO
freq/phase nco.hpp:30-48); squelch events surface via a mid-loop Python
callback (agc.hpp:119-122). Here events and loop telemetry become DATA: a
small pytree returned alongside the audio of every chain step, so the
observability path is jit-compatible, batched, and free to ship off-device
once per block.

Fields (None when a chain has no such loop):
- rssi: end-of-block input level estimate in dB (-20 log10 gain), per
  channel for banks.
- squelch_modes: per-sample squelch FSM state tensor (agc_docs.cpp:53-72
  numbering) -- host-side callbacks (AGC.onRise style) fire from this
  tensor after the block, never mid-loop.
- pll_freq: carrier-recovery loop frequency (rad/sample at the loop's
  rate) at block end -- the recovered carrier offset once locked.
- resamp_credit: fractional-sample credit carried by the resampler
  (SURVEY.md Q8; 0 by construction for planned-shape chains whose block
  length makes the output count integral).
- pilot_level: smoothed 19 kHz stereo-pilot amplitude (composite units)
  at block end -- the stereo-lock indicator for WBFM stereo chains
  (reference FMStereo has no lock telemetry at all; demod.hpp:4-85).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class BlockMetrics(NamedTuple):
    rssi: Optional[jnp.ndarray]
    squelch_modes: Optional[jnp.ndarray]
    pll_freq: Optional[jnp.ndarray]
    resamp_credit: Optional[jnp.ndarray]
    pilot_level: Optional[jnp.ndarray] = None


def rssi_db(gain):
    """Liquid convention (agc.hpp:53-55): rssi = -20 log10(gain)."""
    return -20.0 * jnp.log10(jnp.maximum(gain, 1e-30))


def squelch_events(modes) -> list:
    """Host-side event extraction from a squelch-mode tensor — the
    "events become data" half of the reference's mid-loop callback design
    (SURVEY.md section 3.5; reference agc.hpp:119-122 fires a Python
    ``onRise`` callback from inside the per-sample C loop).

    modes: (N,) or (C, N) int squelch FSM states (agc_docs.cpp numbering,
    kernels/agc.py constants). RISE and FALL are one-sample transition
    states, so each occurrence is one event. Returns a list of dicts
    ``{"kind": "rise"|"fall", "channel": int|None, "sample": int}``
    ordered by sample position (channel=None for single-channel tensors).
    """
    import numpy as np

    from ..kernels.agc import SQ_FALL, SQ_RISE

    m = np.asarray(modes)
    single = m.ndim == 1
    if single:
        m = m[None, :]
    events = []
    for kind, code in (("rise", SQ_RISE), ("fall", SQ_FALL)):
        ch, idx = np.nonzero(m == code)
        events += [{"kind": kind,
                    "channel": None if single else int(c),
                    "sample": int(i)} for c, i in zip(ch, idx)]
    events.sort(key=lambda e: (e["sample"], e["channel"] or 0))
    return events
