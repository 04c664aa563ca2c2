"""NCO / VCO op class (reference nco.hpp:10-81, wrapper.cpp:201-212).

NCO(type='nco'): numerically controlled oscillator with uint32 modular
phase (matching liquid's 32-bit accumulator, SURVEY.md section 2.2),
live freq/phase properties, PLL step, and block mix_up/mix_down.
``type='vco'`` is accepted for parity; in liquid the VCO differs only in
its sin/cos evaluation strategy (exact vs table), which is moot here --
both evaluate exactly on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels import nco as knco
from .base import StatefulOp, as_c64

_mix_up = jax.jit(knco.mix_up)
_mix_down = jax.jit(knco.mix_down)

TWO_PI = 2.0 * np.pi


class NCO(StatefulOp):
    def __init__(self, type="nco"):
        if type not in ("nco", "vco"):
            type = "vco"  # reference: any non-"nco" string selects VCO (nco.hpp:17-24)
        self.type = type
        self._phase_u = np.uint32(0)
        self._freq = 0.0  # radians/sample
        self._dtheta_u = np.uint32(0)
        self._pll_bw = 0.1
        self._pll_alpha = 0.1
        self._pll_beta = float(np.sqrt(0.1))

    # -- properties (wrapper.cpp:205-209) ------------------------------------
    @property
    def freq(self):
        """Frequency in radians/sample (liquid nco_crcf_get_frequency)."""
        return self._freq

    @freq.setter
    def freq(self, fr):
        self._freq = float(fr)
        self._dtheta_u = knco.rad_to_u32(self._freq)

    def adjust_frequency(self, df):
        self.freq = self._freq + float(df)

    @property
    def phase(self):
        """Phase in radians in [0, 2 pi) (liquid nco_crcf_get_phase)."""
        return knco.u32_to_rad(self._phase_u)

    @phase.setter
    def phase(self, phs):
        self._phase_u = knco.rad_to_u32(float(phs))

    def adjust_phase(self, dphs):
        self._phase_u = np.uint32(
            (int(self._phase_u) + int(knco.rad_to_u32(float(dphs)))) & 0xFFFFFFFF
        )

    # -- PLL (liquid nco pll semantics; see tpudsp/kernels/nco.py) ------------
    def set_pll_bandwidth(self, bw):
        self._pll_bw = float(bw)
        self._pll_alpha = float(bw)
        self._pll_beta = float(np.sqrt(bw))

    def pll_step(self, dphase):
        self.freq = self._freq + self._pll_alpha * float(dphase)
        self.adjust_phase(self._pll_beta * float(dphase))

    @property
    def state(self):
        """Full checkpointable state: uint32 phase, frequency, PLL gains."""
        return {
            "phase_u": np.uint32(self._phase_u),
            "freq": self._freq,
            "pll_bw": self._pll_bw,
        }

    def with_state(self, state):
        self._phase_u = np.uint32(state["phase_u"])
        self.freq = float(state["freq"])
        self.set_pll_bandwidth(float(state["pll_bw"]))
        return self

    def print(self):
        print(
            f"nco [type: {self.type}, phase: {self.phase:.6f} rad, "
            f"freq: {self._freq:.6f} rad/sample, pll_bw: {self._pll_bw:.4f}]"
        )

    # -- block mixing (wrapper.cpp:210-212) -----------------------------------
    def mix_up(self, inp):
        xj = as_c64(inp)
        ph, y = _mix_up(jnp.uint32(self._phase_u), jnp.uint32(self._dtheta_u), xj)
        self._phase_u = np.uint32(ph)
        return np.asarray(y)

    def mix_down(self, inp):
        xj = as_c64(inp)
        ph, y = _mix_down(jnp.uint32(self._phase_u), jnp.uint32(self._dtheta_u), xj)
        self._phase_u = np.uint32(ph)
        return np.asarray(y)

    __call__ = mix_up  # wrapper.cpp:210 binds __call__ to mix_up
