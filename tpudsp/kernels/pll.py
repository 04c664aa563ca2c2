"""PLL carrier-recovery scans (JAX/XLA).

The genuinely sequential core of the composite demodulators
(SURVEY.md section 3.4 / section 7 hard part 1): the per-sample feedback
loop of reference demod.hpp:54-84 (FMStereo pilot) and demod.hpp:133-152
(BroadcastAM carrier). Everything LTI around the loop is hoisted out and
runs block-parallel; only the loop itself is a lax.scan, carrying
(theta, freq) [+ the one-pole phase-error filter for FMStereo].

PLL gains follow the liquid nco convention (tpudsp/kernels/nco.py):
freq gain alpha = bw, phase gain beta = sqrt(bw); update order per
reference demod.hpp:62-73: mix with current theta, compute error,
pll_step, then step (theta += freq).

For throughput, ``pll_scan_chunked`` applies the same warmup-chunk
parallelization as the AGC (contraction argument: the loop's memory is
~1/beta samples once near lock).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = np.float32(2.0 * np.pi)


class PllState(NamedTuple):
    theta: jnp.ndarray  # f32, radians (wrapped)
    freq: jnp.ndarray   # f32, radians/sample


def pll_init() -> PllState:
    return PllState(theta=jnp.float32(0.0), freq=jnp.float32(0.0))


def _wrap(t):
    return jnp.mod(t + np.pi, TWO_PI) - np.pi


def pll_carrier_scan(state: PllState, x, bw: float):
    """Track the carrier of ``x``: per sample v = x e^{-j theta},
    err = arg(v), pll_step(err), theta += freq.
    Returns (new_state, theta_per_sample). Use the returned thetas to mix
    any other path elementwise afterwards (reference demod.hpp:141-148
    mixes the delayed wideband path with the same theta)."""
    alpha = jnp.float32(bw)
    beta = jnp.float32(np.sqrt(bw))

    def step(st, xn):
        th, fr = st
        v = xn * jnp.exp(-1j * th)
        err = jnp.arctan2(v.imag, v.real)
        fr = fr + alpha * err
        th_next = _wrap(th + beta * err + fr)
        return PllState(th_next, fr), th

    new_state, thetas = jax.lax.scan(step, state, x)
    return new_state, thetas


class StereoPilotState(NamedTuple):
    theta: jnp.ndarray        # f32 pilot NCO phase
    freq: jnp.ndarray         # f32 pilot NCO freq (rad/sample)
    phase_error: jnp.ndarray  # f32 one-pole filtered error (init 0: Q3 fix)


def stereo_pilot_init() -> StereoPilotState:
    return StereoPilotState(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))


def stereo_pilot_scan(state: StereoPilotState, s, bw: float = 0.1):
    """FMStereo pilot loop over the composite baseband s[n] (real float32),
    reference demod.hpp:54-84 topology: per sample
        sc1 = s * e^{-j theta}            (down by 19 kHz)
        pe  = 0.999 pe + 0.001 arg(sc1)   (one-pole error filter)
        sc  = sc1 * e^{-j theta}          (down by 38 kHz total)
        pll_step(pe); theta += freq
    Returns (new_state, lr) where lr[n] = Re(sc) is the L-R subband.
    The pilot NCO starts at 0 Hz and acquires purely via pll_step, exactly
    as the reference does (SURVEY.md Q3; phase_error initialized to 0)."""
    alpha = jnp.float32(bw)
    beta = jnp.float32(np.sqrt(bw))

    def step(st, sn):
        th, fr, pe = st
        e1 = jnp.exp(-1j * th)
        sc1 = sn * e1
        pe = 0.999 * pe + 0.001 * jnp.arctan2(sc1.imag, sc1.real)
        sc = sc1 * e1
        fr = fr + alpha * pe
        th_next = _wrap(th + beta * pe + fr)
        return StereoPilotState(th_next, fr, pe), sc.real

    new_state, lr = jax.lax.scan(step, state, s.astype(jnp.complex64))
    return new_state, lr.astype(jnp.float32)


def _chunked_scan(scan_fn, state_bcast, state_sel_last, state, x, chunk, warmup):
    """Generic warmup-chunk parallelization of a contractive scan.
    scan_fn(state, xs) -> (state', ys). Chunks are vmapped; chunk i's entry
    state is re-derived by running the scan over the `warmup` samples
    preceding it, started from the carried block-start state. Samples before
    the block start are masked out of the warmup (state passthrough), so
    early chunks with short history get exact entry states."""
    n = x.shape[0]
    if n <= chunk + warmup:
        return scan_fn(state, x)
    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    xp = jnp.pad(x, (0, pad))
    xc = xp.reshape(nchunks, chunk)
    wpad = jnp.concatenate([jnp.zeros((warmup,), x.dtype), xp])
    vpad = jnp.concatenate([jnp.zeros((warmup,), bool), jnp.ones((xp.shape[0],), bool)])
    widx = (jnp.arange(nchunks) * chunk)[:, None] + jnp.arange(warmup)[None, :]
    wwin = wpad[widx]
    wval = vpad[widx]

    def warm_fn(st0, xs_valid):
        xs, valid = xs_valid

        def one(st, xv):
            xn, v = xv
            st2, _ = scan_fn(st, xn[None])
            return jax.tree.map(lambda a, b: jnp.where(v, a, b), st2, st), ()

        st_out, _ = jax.lax.scan(one, st0, (xs, valid))
        return st_out

    neutral = state_bcast(state, nchunks)
    vscan = jax.vmap(scan_fn, in_axes=(0, 0))
    entry = jax.vmap(warm_fn, in_axes=(0, 0))(neutral, (wwin, wval))
    entry = jax.tree.map(lambda e, s: e.at[0].set(s), entry, state)
    final, ys = vscan(entry, xc)
    ys = jax.tree.map(lambda y: y.reshape(-1)[:n], ys)
    new_state = state_sel_last(final)
    if pad:
        last = (nchunks - 1) * chunk
        st0 = jax.tree.map(lambda e: e[-1], entry)
        new_state, _ = scan_fn(st0, x[last:])
    return new_state, ys


def pll_carrier_scan_chunked(state: PllState, x, bw: float, chunk: int = 2048, warmup: int = 4096):
    """Chunk-parallel version of pll_carrier_scan (documented approximation:
    exact after lock to ~exp(-sqrt(bw)*warmup); tested vs the exact scan)."""
    fn = lambda st, xs: pll_carrier_scan(st, xs, bw)
    bcast = lambda s, n: jax.tree.map(lambda v: jnp.broadcast_to(v, (n,)), s)
    sel = lambda f: jax.tree.map(lambda v: v[-1], f)
    return _chunked_scan(fn, bcast, sel, state, x, chunk, warmup)


def stereo_pilot_scan_chunked(
    state: StereoPilotState, s, bw: float = 0.1, chunk: int = 4096, warmup: int = 8192
):
    fn = lambda st, xs: stereo_pilot_scan(st, xs, bw)
    bcast = lambda st, n: jax.tree.map(lambda v: jnp.broadcast_to(v, (n,)), st)
    sel = lambda f: jax.tree.map(lambda v: v[-1], f)
    return _chunked_scan(fn, bcast, sel, state, s, chunk, warmup)
