"""Arbitrary-rate resampler op classes (reference wrapper.cpp parity).

Mirrors: RResampler, CResampler (default design, resampler.hpp:4-70),
RealResampler, ComplexResampler (fully parameterized, resampler.hpp:72-173).

Output length varies call-to-call to achieve the exact long-run rate, as the
reference documents (resampler_doc.cpp:33-39), but the count is *planned*
host-side (deterministic from carried fractional phase) rather than
discovered sample-by-sample (SURVEY.md Q4/Q8 fix). Setting ``rate`` keeps
filter/phase state (liquid resamp_set_rate semantics, SURVEY.md Q5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..design import firdes
from ..kernels import resamp as krs
from .base import StatefulOp, as_c64, as_f32

_resamp_apply = jax.jit(krs.resamp_apply)


class _ResamplerBase(StatefulOp):
    def __init__(self, rate, m, Fc, As, npfb, complex_data):
        if not rate > 0:
            raise ValueError("rate must be positive")
        self._rate = float(rate)
        self._m = int(m)
        self._Fc = float(Fc)
        self._As = float(As)
        self._npfb = int(npfb)
        self._complex = complex_data
        self._dtype = jnp.complex64 if complex_data else jnp.float32
        H = firdes.resamp_bank(self._m, self._Fc, self._As, self._npfb)
        self._H = jnp.asarray(H, jnp.float32)
        self.reset()

    def reset(self):
        """Clear filter tail and fractional phase (liquid resamp_*_reset)."""
        self._tau = 0.0
        self._state = krs.resamp_init(2 * self._m, self._dtype)

    @property
    def state(self):
        """Full checkpointable state: filter tail + fractional phase."""
        return {"tail": np.asarray(self._state), "tau": self._tau}

    def with_state(self, state):
        self._state = jnp.asarray(state["tail"])
        self._tau = float(state["tau"])
        return self

    @property
    def rate(self):
        return self._rate

    @rate.setter
    def rate(self, r):
        # liquid resamp_*_set_rate keeps the filter state (reference
        # resampler.hpp:96-99); only the rate changes.
        if not r > 0:
            raise ValueError("rate must be positive")
        self._rate = float(r)

    def print(self):
        print(
            f"resamp [rate: {self._rate:.6f}, m: {self._m}, Fc: {self._Fc:.4f}, "
            f"As: {self._As:.1f} dB, npfb: {self._npfb}, tau: {self._tau:.6f}]"
        )

    def __call__(self, inp):
        xj = as_c64(inp) if self._complex else as_f32(inp)
        n_out, q, frac, new_tau = krs.plan(self._tau, int(xj.shape[0]), self._rate)
        if n_out == 0:
            ntaps = 2 * self._m
            X = jnp.concatenate([self._state, xj])
            self._state = X[-ntaps:]
            self._tau = new_tau
            return np.zeros((0,), dtype=np.complex64 if self._complex else np.float32)
        self._state, y = _resamp_apply(self._H, self._state, xj,
                                       jnp.asarray(q), jnp.asarray(frac))
        self._tau = new_tau
        return np.asarray(y)


class RResampler(_ResamplerBase):
    """Real arbitrary-rate resampler, default design (reference
    resampler.hpp:4-37, wrapper.cpp:15-18): RResampler(rate)."""

    def __init__(self, rate):
        m, fc, As, npfb = firdes.default_resamp_params(rate)
        super().__init__(rate, m, fc, As, npfb, complex_data=False)


class CResampler(_ResamplerBase):
    """Complex twin of RResampler (reference resampler.hpp:39-70,
    wrapper.cpp:20-23)."""

    def __init__(self, rate):
        m, fc, As, npfb = firdes.default_resamp_params(rate)
        super().__init__(rate, m, fc, As, npfb, complex_data=True)


class RealResampler(_ResamplerBase):
    """Fully parameterized real resampler (reference resampler.hpp:72-125,
    wrapper.cpp:214-219): RealResampler(rate, len=20, Fc, As=60, nfilter=13).

    Kwarg names match the reference: ``len`` is the polyphase semi-length,
    ``nfilter`` the polyphase bank count, ``Fc`` the anti-alias cutoff
    normalized to the input rate.
    """

    def __init__(self, rate, len=20, Fc=None, As=60.0, nfilter=13):
        if Fc is None:
            raise TypeError("Fc is required")
        super().__init__(rate, len, Fc, As, nfilter, complex_data=False)


class ComplexResampler(_ResamplerBase):
    """Complex twin of RealResampler (reference resampler.hpp:127-173,
    wrapper.cpp:221-226)."""

    def __init__(self, rate, len=20, Fc=None, As=60.0, nfilter=13):
        if Fc is None:
            raise TypeError("Fc is required")
        super().__init__(rate, len, Fc, As, nfilter, complex_data=True)
