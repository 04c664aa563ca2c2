"""Utility ops: Delay, HilbertTransform, bytes_to_iq
(reference utility.hpp, wrapper.cpp:13, 25-28, 174-176).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..design import firdes
from ..kernels import fir as kfir
from ..kernels import hilbert as khilb
from .base import StatefulOp

_delay_apply = jax.jit(kfir.delay_apply)
_interp_apply = jax.jit(khilb.interp_apply)
_decim_apply = jax.jit(khilb.decim_apply)


class Delay(StatefulOp):
    """Fixed N-sample delay line (reference utility.hpp:5-59,
    wrapper.cpp:25-28): Delay(nd=1). Dtype-dispatches: complex64 and
    float32 inputs use independent delay lines, like the reference's twin
    wdelayf/wdelaycf handles. Setting ``delay`` recreates the lines,
    clearing state (reference utility.hpp:27-33, SURVEY.md Q5). Unknown
    dtypes raise TypeError (Q7 fix: the reference silently returns None)."""

    def __init__(self, nd=1):
        self._nd = int(nd)
        self.reset()

    def reset(self):
        self._state = {
            "real": kfir.delay_init(self._nd, jnp.float32),
            "complex": kfir.delay_init(self._nd, jnp.complex64),
        }

    @property
    def delay(self):
        return self._nd

    @delay.setter
    def delay(self, nd):
        self._nd = int(nd)
        self.reset()  # reference recreates handles, clearing state

    def __call__(self, inp):
        x = np.asarray(inp)
        if x.ndim != 1:
            raise TypeError(f"Delay: expected 1-D array, got shape {x.shape}")
        if x.dtype == np.complex64:
            buf, y = _delay_apply(self._state["complex"], jnp.asarray(x))
            self._state["complex"] = buf
            return np.asarray(y)
        if x.dtype == np.float32:
            buf, y = _delay_apply(self._state["real"], jnp.asarray(x))
            self._state["real"] = buf
            return np.asarray(y)
        raise TypeError(
            f"Delay: expected complex64 or float32 input, got {x.dtype}"
        )


class HilbertTransform(StatefulOp):
    """Real<->complex conversion via half-band FIR Hilbert (reference
    utility.hpp:71-108, wrapper.cpp:174-176): HilbertTransform(m=5, As=60).

    Implements the reference's *intended* semantics (its buffer handling is
    buggy -- SURVEY.md Q1): complex64 input -> interp -> float32 at 2x the
    rate (2N samples); float32 input (even length) -> decim -> complex64 at
    half the rate (N/2 samples). Unknown dtypes raise TypeError (Q7 fix)."""

    def __init__(self, m=5, As=60.0):
        self._m = int(m)
        self._h = jnp.asarray(firdes.halfband_lowpass(self._m, As), jnp.float32)
        self._interp = _interp_apply
        self._decim = _decim_apply
        self.reset()

    def reset(self):
        self._state = {
            "interp": khilb.interp_init(self._m),
            "decim": khilb.decim_init(self._m),
        }

    def __call__(self, inp):
        x = np.asarray(inp)
        if x.ndim != 1:
            raise TypeError(f"HilbertTransform: expected 1-D array, got {x.shape}")
        if x.dtype == np.complex64:
            st, y = self._interp(self._h, self._state["interp"], jnp.asarray(x))
            self._state["interp"] = st
            return np.asarray(y)
        if x.dtype == np.float32:
            if len(x) % 2:
                raise ValueError("HilbertTransform: decimating path needs even length")
            st, y = self._decim(self._h, self._state["decim"], jnp.asarray(x))
            self._state["decim"] = st
            return np.asarray(y)
        raise TypeError(
            f"HilbertTransform: expected complex64 or float32, got {x.dtype}"
        )


def bytes_to_iq(byts: bytes) -> np.ndarray:
    """Raw interleaved int16 IQ bytes -> complex64 scaled by 1/32767
    (reference utility.hpp:61-69). Delegates to the native-backed
    implementation in tpudsp/io/ingest.py (C fast path when the local
    toolchain built it, NumPy fallback otherwise); trailing bytes that do
    not complete a 4-byte IQ pair are dropped, as the reference's size/4
    loop does."""
    from ..io.ingest import bytes_to_iq as _impl
    return _impl(byts)
