"""Pure-function DSP kernels: (params, state, block) -> (state, block).

Every stateful primitive of the reference (SURVEY.md section 2.1) has a
block-parallel formulation here with explicit carried state; the ops layer
(tpudsp/ops) wraps these in the reference's class surface.
"""

from . import agc, ampmodem, fir, freqdem, hilbert, iir, nco, pll, resamp  # noqa: F401
