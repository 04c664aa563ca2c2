"""Hilbert / half-band transforms (JAX/XLA).

Equivalent of liquid ``firhilbf`` in its four modes (reference
utility.hpp:71-108, demod.hpp:155-187), implementing the *intended*
semantics -- the reference's HilbertTransform buffer handling is buggy
(overlapping writes/reads, SURVEY.md Q1) and is fixed here:

  - c2r  : complex -> (lower, upper) real sidebands at the SAME rate
           (used by SSBDemod, demod.hpp:179-185):
               lower = I_delayed + H{Q},  upper = I_delayed - H{Q}
           (H = odd-tap Hilbert FIR, delay = its 2m-sample group delay)
  - interp: complex at rate r -> real at 2r (half-band 2x upsample then
           modulate to fs/4): y[k] = Re(x_up[k] * j^k)
  - decim : real at rate 2r -> complex at r: mix by (-j)^k, half-band
           lowpass, take every 2nd sample, times 2.

All modes are block-parallel FIR work (tpudsp/kernels/fir.py) with carried
tails; no per-sample loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import fir


class C2RState(NamedTuple):
    fir_tail: jnp.ndarray    # (4m,) float32: Hilbert FIR tail on Q
    delay_buf: jnp.ndarray   # (2m,) float32: I-branch group-delay buffer


def c2r_init(m: int) -> C2RState:
    return C2RState(
        fir_tail=fir.fir_init(4 * m + 1, jnp.float32),
        delay_buf=fir.delay_init(2 * m, jnp.float32),
    )


def c2r_apply(h_hilb, state: C2RState, x):
    """x: (N,) complex64 -> (new_state, (lower, upper)) float32 each (N,)."""
    tail, hq = fir.fir_apply(h_hilb, state.fir_tail, x.imag.astype(jnp.float32))
    dbuf, i_d = fir.delay_apply(state.delay_buf, x.real.astype(jnp.float32))
    return C2RState(tail, dbuf), (i_d + hq, i_d - hq)


class InterpState(NamedTuple):
    tail: jnp.ndarray   # (4m,) complex64 half-band tail (on zero-stuffed x)
    parity: jnp.ndarray  # uint32: running output-sample index mod 4


def interp_init(m: int) -> InterpState:
    return InterpState(
        tail=fir.fir_init(4 * m + 1, jnp.complex64), parity=jnp.uint32(0)
    )


def interp_apply(h_hb, state: InterpState, x):
    """x: (N,) complex64 -> (new_state, y (2N,) float32)."""
    n = x.shape[0]
    up = jnp.zeros((2 * n,), dtype=jnp.complex64)
    up = up.at[::2].set(2.0 * x)  # zero-stuff; 2x gain restores amplitude
    tail, xf = fir.fir_apply(h_hb, state.tail, up)
    k = state.parity + jnp.arange(2 * n, dtype=jnp.uint32)
    ph = (k & jnp.uint32(3)).astype(jnp.int32)
    # Re(xf * j^k): phases 0,1,2,3 -> Re, -Im, -Re, Im
    re, im = xf.real, xf.imag
    y = jnp.where(ph == 0, re, jnp.where(ph == 1, -im, jnp.where(ph == 2, -re, im)))
    return InterpState(tail, (state.parity + jnp.uint32(2 * n)) & jnp.uint32(3)), y.astype(jnp.float32)


class DecimState(NamedTuple):
    tail: jnp.ndarray    # (4m,) complex64 half-band tail
    parity: jnp.ndarray  # uint32 running input index mod 4


def decim_init(m: int) -> DecimState:
    return DecimState(tail=fir.fir_init(4 * m + 1, jnp.complex64), parity=jnp.uint32(0))


def decim_apply(h_hb, state: DecimState, x):
    """x: (N,) float32, N even -> (new_state, y (N//2,) complex64)."""
    n = x.shape[0]
    k = state.parity + jnp.arange(n, dtype=jnp.uint32)
    ph = (k & jnp.uint32(3)).astype(jnp.int32)
    # x * (-j)^k: phases 0..3 -> (x, 0), (0, -x), (-x, 0), (0, x)
    re = jnp.where(ph == 0, x, jnp.where(ph == 2, -x, 0.0))
    im = jnp.where(ph == 1, -x, jnp.where(ph == 3, x, 0.0))
    xc = (re + 1j * im).astype(jnp.complex64)
    tail, xf = fir.fir_apply(h_hb, state.tail, xc)
    y = 2.0 * xf[::2]
    return DecimState(tail, (state.parity + jnp.uint32(n)) & jnp.uint32(3)), y.astype(jnp.complex64)
