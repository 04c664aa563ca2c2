"""FM demodulation (JAX/XLA). Equivalent of liquid ``freqdem``
(reference demod.hpp:189-219): y[n] = arg(conj(x[n-1]) x[n]) / (2 pi kd).

Embarrassingly parallel given a 1-sample halo (SURVEY.md section 2.2 row
"freqdem"): the carried state is just the previous block's last sample.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fastmath import patan2

TWO_PI = np.float32(2.0 * np.pi)


def freqdem_init():
    """liquid resets r_prime to 1+0j (zero initial phase difference)."""
    return jnp.complex64(1.0 + 0.0j)


def freqdem_apply(kd, prev, x):
    """prev: complex64 scalar (last sample of previous block); x: (N,)
    complex64. Returns (new_prev, y) with y float32."""
    xprev = jnp.concatenate([prev[None], x[:-1]])
    d = x * jnp.conj(xprev)
    # patan2: the shared polynomial atan2 (kernels/fastmath.py) — 28x
    # jnp.arctan2 on XLA:CPU, identical numerics to the Pallas kernels;
    # its ~2e-6 rad error scales to an audio floor near 114 dB
    y = patan2(d.imag, d.real) / (TWO_PI * kd)
    return x[-1], y.astype(jnp.float32)
