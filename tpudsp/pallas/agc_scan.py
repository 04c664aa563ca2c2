"""Pallas TPU kernel: VMEM-resident chunk-parallel AGC scan.

The chunked AGC (tpudsp/kernels/agc.py) is a vmapped lax.scan: chunks ride
the vector lanes, time steps are sequential. XLA already compiles this
well; this kernel removes the remaining overheads by pinning everything in
VMEM and fusing warmup + main scan into one pass per lane tile:

  layout: x laid out (steps, lanes) with lanes = chunks, so each loop
  iteration touches one (1, 128)-row (VPU-shaped); the five state vectors
  (g, y2p, squelch mode, timer) live in VMEM scratch for the whole scan.
  Grid tiles the chunk axis in blocks of 128 lanes.

Opt-in drop-in for the XLA chunked AGC (AGC(use_pallas=True), or call
agc_chunked_pallas directly): measured at parity with the XLA scan+vmap
path on TPU v5e (0.12 vs 0.11 ms at 96k samples), so the XLA path stays
the default. Correctness is pinned to the XLA kernel by tests (interpret
mode on CPU; compiled natively on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels.agc import (
    SQ_ENABLED, SQ_SIGNALLO, AgcParams, AgcState, _fsm_step,
)

LANES = 128


def _agc_kernel(scal_ref, wre_ref, wim_ref, wval_ref, xre_ref, xim_ref,
                g0_ref, y2p0_ref, mode0_ref, timer0_ref,
                yre_ref, yim_ref, modes_ref, gN_ref, y2pN_ref,
                modeN_ref, timerN_ref):
    """One lane-tile: warmup over (W, LANES) then main scan over (S, LANES).

    scal_ref (SMEM): [alpha, locked, squelch, threshold, timeout, scale].
    """
    alpha = scal_ref[0]
    locked = scal_ref[1] > 0.5
    squelch_on = scal_ref[2] > 0.5
    threshold = scal_ref[3]
    timeout = scal_ref[4].astype(jnp.int32)
    scale = scal_ref[5]
    W = wre_ref.shape[0]
    S = xre_ref.shape[0]

    def sample_step(xr, xi, g, y2p, mode, timer):
        yr = xr * g
        yi = xi * g
        y2 = yr * yr + yi * yi
        y2p = (1.0 - alpha) * y2p + alpha * y2
        g_new = g * jnp.exp(-0.5 * alpha * jnp.log(y2p + 1e-30))
        g_new = jnp.minimum(g_new, 1e6)
        g = jnp.where(locked, g, g_new)
        rssi = -20.0 * jnp.log10(jnp.maximum(g, 1e-30))
        high = rssi > threshold
        # shared FSM step (kernels/agc.py): pure jnp, Pallas-safe
        mode, timer = _fsm_step(mode, timer, high, timeout, squelch_on)
        zero = (mode == SQ_ENABLED) | (mode == SQ_SIGNALLO)
        outr = jnp.where(zero, 0.0, yr * scale)
        outi = jnp.where(zero, 0.0, yi * scale)
        return outr, outi, g, y2p, mode, timer

    def warm_body(t, st):
        g, y2p, mode, timer = st
        xr = wre_ref[t, :][None, :]
        xi = wim_ref[t, :][None, :]
        v = wval_ref[t, :][None, :] > 0
        _, _, g2, y2p2, mode2, timer2 = sample_step(xr, xi, g, y2p, mode, timer)
        return (jnp.where(v, g2, g), jnp.where(v, y2p2, y2p),
                jnp.where(v, mode2, mode), jnp.where(v, timer2, timer))

    st0 = (g0_ref[...], y2p0_ref[...], mode0_ref[...], timer0_ref[...])
    st = jax.lax.fori_loop(0, W, warm_body, st0)

    def main_body(t, st):
        g, y2p, mode, timer = st
        xr = xre_ref[t, :][None, :]
        xi = xim_ref[t, :][None, :]
        outr, outi, g, y2p, mode, timer = sample_step(xr, xi, g, y2p, mode, timer)
        yre_ref[t, :] = outr[0, :]
        yim_ref[t, :] = outi[0, :]
        modes_ref[t, :] = mode[0, :]
        return (g, y2p, mode, timer)

    g, y2p, mode, timer = jax.lax.fori_loop(0, S, main_body, st)
    gN_ref[...] = g
    y2pN_ref[...] = y2p
    modeN_ref[...] = mode
    timerN_ref[...] = timer


def agc_chunked_pallas(params: AgcParams, state: AgcState, x,
                       chunk: int = 1024, warmup: int = 2048,
                       interpret: bool = False):
    """Drop-in for kernels/agc.agc_apply_chunked on TPU. Same semantics:
    warmup-masked entry-state re-derivation, exact first chunk. Returns
    (new_state, (y, modes))."""
    from ..kernels import agc as kagc
    n = x.shape[0]
    if n <= chunk + warmup:
        return kagc.agc_apply(params, state, x)
    nchunks = -(-n // chunk)
    # pad the chunk axis to a LANES multiple (padded lanes discarded)
    nlanes = -(-nchunks // LANES) * LANES
    pad = nchunks * chunk - n
    xp = jnp.pad(x, (0, pad + (nlanes - nchunks) * chunk))
    xc = xp.reshape(nlanes, chunk).T  # (chunk, nlanes): steps major
    wpad = jnp.concatenate([jnp.zeros((warmup,), x.dtype), xp])
    vpad = jnp.concatenate([
        jnp.zeros((warmup,), jnp.int32),
        jnp.ones((nchunks * chunk,), jnp.int32),
        jnp.zeros(((nlanes - nchunks) * chunk,), jnp.int32),
    ])
    starts = jnp.arange(nlanes) * chunk
    widx = starts[None, :] + jnp.arange(warmup)[:, None]  # (warmup, nlanes)
    wwin = wpad[widx]
    wval = vpad[widx]

    scal = jnp.stack([
        params.alpha, params.locked.astype(jnp.float32),
        params.squelch.astype(jnp.float32), params.threshold,
        params.timeout.astype(jnp.float32), params.scale,
    ])
    g0 = jnp.broadcast_to(state.g, (1, nlanes)).astype(jnp.float32)
    y2p0 = jnp.broadcast_to(state.y2p, (1, nlanes)).astype(jnp.float32)
    mode0 = jnp.broadcast_to(state.sq_mode, (1, nlanes)).astype(jnp.int32)
    timer0 = jnp.broadcast_to(state.sq_timer, (1, nlanes)).astype(jnp.int32)

    grid = (nlanes // LANES,)
    col = lambda i: (0, i)
    vec = lambda i: (0, i)
    out_shapes = (
        jax.ShapeDtypeStruct((chunk, nlanes), jnp.float32),  # y re
        jax.ShapeDtypeStruct((chunk, nlanes), jnp.float32),  # y im
        jax.ShapeDtypeStruct((chunk, nlanes), jnp.int32),    # modes
        jax.ShapeDtypeStruct((1, nlanes), jnp.float32),      # g final
        jax.ShapeDtypeStruct((1, nlanes), jnp.float32),
        jax.ShapeDtypeStruct((1, nlanes), jnp.int32),
        jax.ShapeDtypeStruct((1, nlanes), jnp.int32),
    )
    res = pl.pallas_call(
        _agc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((warmup, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((warmup, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((warmup, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), vec, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(scal, wwin.real.astype(jnp.float32), wwin.imag.astype(jnp.float32),
      wval, xc.real.astype(jnp.float32), xc.imag.astype(jnp.float32),
      g0, y2p0, mode0, timer0)
    yre, yim, modes_t, gN, y2pN, modeN, timerN = res
    y = (yre + 1j * yim).astype(jnp.complex64).T.reshape(-1)[:n]
    modes = modes_t.T.reshape(-1)[:n].astype(jnp.int32)

    # carried state: exact semantics -- last REAL chunk's final state.
    last = nchunks - 1
    new_state = AgcState(
        g=gN[0, last], y2p=y2pN[0, last], sq_mode=modeN[0, last],
        sq_timer=timerN[0, last])
    if pad:
        # the last chunk was zero-padded: re-derive its carry from the
        # unpadded tail, starting from its (exactly computed) entry state.
        # Entry state of chunk `last` = final state of its warmup pass; we
        # don't have it separately here, so rerun the tail from the
        # previous chunk's final state (identical trajectory).
        prev = last - 1
        st0 = AgcState(g=gN[0, prev], y2p=y2pN[0, prev],
                       sq_mode=modeN[0, prev], sq_timer=timerN[0, prev])
        new_state, _ = kagc.agc_apply(params, st0, x[last * chunk:])
    return new_state, (y, modes)
