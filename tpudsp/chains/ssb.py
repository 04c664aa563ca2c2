"""SSB receiver chain: channel filter + decimate -> AGC -> Hilbert
sideband split -> audio (SURVEY.md section 7 chains/ sketch, SSBReceiver).

Entirely block-parallel: the front end is the same fused
filter-at-the-output-rate blocked matmul as the AM chain (the channel
lowpass folds into the decimating polyphase), the AGC uses the
chunk-parallel scan, and the sideband split is FIR work -- there is no
PLL anywhere (suppressed-carrier SSB).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..design import firdes
from ..kernels import agc as kagc
from ..kernels import decimate as kdec
from ..kernels import hilbert as khilb
from ..kernels import warmup as kwarm
from . import metrics as kmet
from .metrics import BlockMetrics


@dataclass(frozen=True)
class SSBConfig:
    band: str = "usb"               # which sideband carries the voice
    bandwidth: float = 3000.0       # audio bandwidth in Hz
    iq_rate: float = 2_000_000.0
    pcm_rate: float = 48_000.0
    agc_bandwidth: float = 0.01
    agc_scale: float = 0.01
    resamp_m: int = 13
    resamp_npfb: int = 64
    chan_taps: int = 1024           # channel lowpass length at the input rate
    hilb_m: int = 25                # sideband-split semi-length (SSBDemod's 25)

    @property
    def rate(self):
        return self.pcm_rate / self.iq_rate


class SSBState(NamedTuple):
    rs_tail: jnp.ndarray          # fused front-end input tail
    agc: kagc.AgcState
    c2r: khilb.C2RState


class SSBParams(NamedTuple):
    taps_fused: jnp.ndarray       # (P, Kc, Q) blocked fused taps
    h_hilb: jnp.ndarray
    agc: kagc.AgcParams


def build(cfg: SSBConfig, block_len: int):
    rate = cfg.rate
    n_out_f = block_len * rate
    n_out = int(round(n_out_f))
    if abs(n_out_f - n_out) > 1e-9:
        raise ValueError(f"block_len {block_len} * rate {rate} must be integral")
    f = Fraction(rate).limit_denominator(10000)
    P, Q = f.numerator, f.denominator
    # channel filter: the SSB channel is one-sided; a +/- bandwidth lowpass
    # at the input rate (the Hilbert split downstream rejects the mirror)
    h_ch = firdes.kaiser_lowpass(cfg.chan_taps,
                                 max(cfg.bandwidth / cfg.iq_rate, 1e-4), 80.0)
    H = firdes.resamp_bank(cfg.resamp_m, 0.45 * rate, 60.0, cfg.resamp_npfb)
    taps_raw, kf, offs = kdec.plan_fused_frontend(H, h_ch, P, Q)
    # offset-folded: one matmul pass over the input for all P phases
    taps_fused = kdec.fold_offsets(taps_raw, offs, Q)
    params = SSBParams(
        taps_fused=jnp.asarray(taps_fused),
        h_hilb=jnp.asarray(firdes.hilbert_fir(cfg.hilb_m, 60.0), jnp.float32),
        agc=kagc.make_params(alpha=cfg.agc_bandwidth, scale=cfg.agc_scale),
    )
    state = SSBState(
        rs_tail=jnp.zeros((kf,), jnp.complex64),
        agc=kagc.agc_init(),
        c2r=khilb.c2r_init(cfg.hilb_m),
    )
    return params, state, n_out


def ssb_step(params: SSBParams, state: SSBState, iq, *, cfg: SSBConfig,
             n_out: int, exact: bool = False):
    f = Fraction(cfg.rate).limit_denominator(10000)
    P, Q = f.numerator, f.denominator
    nj = n_out // P
    rs_tail, y48 = kdec.fused_frontend_apply_shared(
        params.taps_fused, state.rs_tail, iq, Q, nj)

    # warmup from the AGC loop bandwidth (kernels/warmup.py); the AGC is
    # the only feedback loop in this chain (the Hilbert split is FIR)
    w = kwarm.warmup_for(agc_alpha=cfg.agc_bandwidth)
    agc_fn = kagc.agc_apply if exact else partial(
        kagc.agc_apply_chunked, chunk=kwarm.chunk_for(w), warmup=w)
    agc_state, (z, modes) = agc_fn(params.agc, state.agc, y48)

    c2r, (lower, upper) = khilb.c2r_apply(params.h_hilb, state.c2r, z)
    audio = upper if cfg.band == "usb" else lower
    metrics = BlockMetrics(rssi=kmet.rssi_db(agc_state.g),
                           squelch_modes=modes,
                           pll_freq=None, resamp_credit=None)
    return SSBState(rs_tail, agc_state, c2r), (audio, metrics)


class SSBReceiver:
    """Stateful SSB receiver over fixed-size IQ blocks (single jit)."""

    def __init__(self, cfg: SSBConfig = SSBConfig(), block_len: int = 1_000_000,
                 exact: bool = False):
        self.cfg = cfg
        self.block_len = int(block_len)
        self.metrics = None
        from ..utils.hostbuild import host_build
        self.params, self.state, self.n_out = host_build(
            build, cfg, self.block_len)
        self._step = jax.jit(partial(ssb_step, cfg=cfg, n_out=self.n_out,
                                     exact=exact))

    def __call__(self, iq):
        """Returns audio on device; sets ``self.metrics`` (rssi, squelch
        modes) for the block."""
        iq = jnp.asarray(iq, jnp.complex64)
        if iq.shape[0] != self.block_len:
            raise ValueError(f"expected block of {self.block_len} samples")
        self.state, (audio, metrics) = self._step(self.params, self.state, iq)
        self.metrics = metrics
        return audio
