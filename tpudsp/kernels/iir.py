"""Block-parallel IIR execution (JAX/XLA, TPU-first).

Two execution modes for the liquid ``iirfilt_*`` equivalents (reference
iirfilter.hpp:52-58, 292-298):

1. ``sos_scan``: exact SOS cascade as a log-depth associative scan over
   2x2 state-transition operators -- the reference's per-sample transposed
   direct-form-II recurrence reformulated as a parallel prefix
   (SURVEY.md section 2.2 row "iirfilt SOS engine").

2. truncated-impulse-response mode (see tpudsp/design/iirdes.py
   sos_impulse_response + tpudsp/kernels/fir.py): the LTI filter runs as a
   fully parallel overlap-save convolution. Ops choose this when the
   impulse response decays within a budget; it is the TPU speed-of-light
   path (no sequential dependence at all).

State convention: every function is pure, ``(params, state, x) -> (state, y)``
with state an explicit pytree (SURVEY.md section 7 core decision 1).

Transposed direct form II per biquad (b0,b1,b2,1,a1,a2):
    y[n]  = b0 x[n] + s1[n-1]
    s1[n] = b1 x[n] - a1 y[n] + s2[n-1]
    s2[n] = b2 x[n] - a2 y[n]
Eliminating y[n] gives the linear state recurrence v[n] = A v[n-1] + c x[n]:
    A = [[-a1, 1], [-a2, 0]],  c = [b1 - a1 b0, b2 - a2 b0]
whose prefix products are computed with jax.lax.associative_scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sos_init(sos: np.ndarray, dtype=jnp.float32):
    """Zero state for an SOS cascade: (S, 2) per-biquad DF2T state."""
    return jnp.zeros((len(sos), 2), dtype=dtype)


def _biquad_scan(coef, v0, x):
    """One biquad over a block via associative scan.

    coef: (6,) float32 [b0,b1,b2,1,a1,a2]; v0: (2,) state; x: (N,).
    Returns (v_last, y).
    """
    b0, b1, b2, _, a1, a2 = [coef[i] for i in range(6)]
    n = x.shape[0]
    # Elements (M, u): prefix P[n] = (A^{n+1}, sum_k A^{n-k} c x[k]),
    # combine (M1,u1) then (M2,u2) -> (M2 M1, M2 u1 + u2).
    A = jnp.stack(
        [jnp.stack([-a1, jnp.ones_like(a1)]), jnp.stack([-a2, jnp.zeros_like(a2)])]
    )
    c = jnp.stack([b1 - a1 * b0, b2 - a2 * b0])

    M = jnp.broadcast_to(A, (n, 2, 2))
    u = c[None, :] * x[:, None]

    def combine(e1, e2):
        M1, u1 = e1
        M2, u2 = e2
        return jnp.matmul(M2, M1), jnp.einsum("nij,nj->ni", M2, u1) + u2

    Mp, up = jax.lax.associative_scan(combine, (M, u))
    v = jnp.einsum("nij,j->ni", Mp, v0) + up            # v[n], n = 0..N-1
    v_prev = jnp.concatenate([v0[None, :], v[:-1]], 0)  # v[n-1]
    y = b0 * x + v_prev[:, 0]
    return v[-1], y


def sos_apply(sos, state, x):
    """SOS cascade over a 1-D block. sos: (S, 6) float32 device array;
    state: (S, 2) (complex for complex x); x: (N,) float32/complex64.
    Returns (new_state, y). Stages run sequentially (S is small), each
    stage block-parallel."""
    S = sos.shape[0]
    new_states = []
    y = x
    for s in range(S):
        vs, y = _biquad_scan(sos[s], state[s], y)
        new_states.append(vs)
    return jnp.stack(new_states), y


def first_order_init(dtype=jnp.float32):
    return jnp.zeros((), dtype=dtype)


def first_order_apply(b0, a, y_prev, x):
    """y[n] = b0 x[n] + a y[n-1] via first-order associative scan
    (deemphasis / one-pole smoothers, reference iirfilter.hpp:358-392).
    b0, a: scalars; y_prev: scalar carried state; x: (N,).
    Returns (y_last, y)."""
    n = x.shape[0]
    a_arr = jnp.broadcast_to(jnp.asarray(a, x.real.dtype), (n,))
    u = b0 * x + jnp.zeros_like(x)

    def combine(e1, e2):
        a1, u1 = e1
        a2, u2 = e2
        return a1 * a2, a2 * u1 + u2

    ap, up = jax.lax.associative_scan(combine, (a_arr, u))
    y = ap * y_prev + up
    return y[-1], y
