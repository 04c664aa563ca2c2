"""Sanitizer pass (SURVEY.md section 5 "race detection / sanitizers";
round-1 VERDICT "do this" #7): the kernel suite runs clean under
jax.debug_nans -- any NaN/Inf produced inside a jitted kernel raises
immediately. Exercises every feedback/scan kernel on realistic signals,
including the numerically delicate spots (log of tracked power in the
AGC, atan2 in the PLL/freqdem, near-unit poles in the compensated SOS
scan)."""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@contextlib.contextmanager
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


def test_kernels_clean_under_debug_nans():
    from tpudsp.design import firdes, iirdes
    from tpudsp.kernels import agc as kagc
    from tpudsp.kernels import am_backend as kab
    from tpudsp.kernels import fir as kfir
    from tpudsp.kernels import freqdem as kfd
    from tpudsp.kernels import hilbert as khilb
    from tpudsp.kernels import iir as kiir
    from tpudsp.kernels import pll as kpll
    from tpudsp.kernels import resamp as krs
    from tpudsp.kernels.warmup import chunk_for, warmup_for

    n = 30_000
    t = np.arange(n)
    m = np.sin(2 * np.pi * 0.01 * t)
    x = ((1 + 0.5 * m) * 0.3
         * np.exp(2j * np.pi * 0.002 * t)).astype(np.complex64)
    xj = jnp.asarray(x)

    with debug_nans():
        # AGC: exact + chunked (log/exp of tracked power; zero-signal head)
        params = kagc.make_params(alpha=0.01, squelch=True, threshold=-20.0)
        xz = jnp.concatenate([jnp.zeros((500,), jnp.complex64), xj])
        _, (y, modes) = jax.jit(kagc.agc_apply)(
            params, kagc.agc_init(squelch=True), xz)
        jax.block_until_ready(y)
        w = warmup_for(agc_alpha=0.01, squelch_timeout=100)
        _, (y2, _) = jax.jit(lambda p, s, v: kagc.agc_apply_chunked(
            p, s, v, chunk=chunk_for(w), warmup=w))(
            params, kagc.agc_init(squelch=True), xz)
        jax.block_until_ready(y2)

        # PLL carrier scan (atan2 feedback), exact + chunked
        _, th = jax.jit(lambda s, v: kpll.pll_carrier_scan(s, v, 0.001))(
            kpll.pll_init(), xj)
        jax.block_until_ready(th)
        _, th2 = jax.jit(lambda s, v: kpll.pll_carrier_scan_chunked(
            s, v, 0.001))(kpll.pll_init(), xj)
        jax.block_until_ready(th2)

        # combined AM back end
        p = kab.make_params(kagc.make_params(alpha=0.01, scale=0.01),
                            0.5, 0.05, 0.95, carrier=True)
        _, (pcm, _) = jax.jit(kab.am_backend_exact)(p, kab.init_state(), xj)
        jax.block_until_ready(pcm)

        # freqdem on a zero-leading stream (atan2(0,0) must stay finite)
        _, s = jax.jit(lambda st, v: kfd.freqdem_apply(jnp.float32(0.1), st, v)
                       )(kfd.freqdem_init(), xz)
        jax.block_until_ready(s)

        # SOS cascade with near-unit poles (compensated double-float scan)
        sos = iirdes.iirdes_sos("cheby2", "highpass", 3, 20.0 / 48000.0,
                                Ap=0.5, As=20.0)
        split = kiir.sos_split_df(sos)
        st0 = kiir.sos_init(np.zeros((len(sos), 6)), jnp.float32)
        _, yd = jax.jit(kiir.sos_apply_df)(split, st0,
                                           jnp.asarray(m, jnp.float32))
        jax.block_until_ready(yd)

        # FIR (overlap-save FFT path) + Hilbert c2r + polyphase resampler
        h = jnp.asarray(firdes.kaiser_lowpass(257, 0.1, 60.0), jnp.float32)
        _, yf = jax.jit(kfir.fir_apply)(h, kfir.fir_init(257, jnp.complex64), xj)
        jax.block_until_ready(yf)
        hh = jnp.asarray(firdes.hilbert_fir(25, 60.0), jnp.float32)
        _, (lo, up) = jax.jit(khilb.c2r_apply)(hh, khilb.c2r_init(25), xj)
        jax.block_until_ready(up)
        H = jnp.asarray(firdes.resamp_bank(13, 0.4, 60.0, 64), jnp.float32)
        n_out, q, frac, _ = krs.plan(0.0, n, 0.5)
        _, yr = jax.jit(krs.resamp_apply)(
            H, krs.resamp_init(26, jnp.complex64), xj,
            jnp.asarray(q), jnp.asarray(frac))
        jax.block_until_ready(yr)

        # stereo pilot recovery (normalized phasor at near-zero magnitude)
        sz = jnp.concatenate([jnp.zeros((500,), jnp.float32),
                              jnp.asarray(m, jnp.float32)])
        _, lr = jax.jit(lambda st, v: kpll.stereo_pilot_apply(
            st, v, jnp.uint32(123456789)))(kpll.stereo_pilot_init(), sz)
        jax.block_until_ready(lr)


def test_chain_clean_under_debug_nans():
    from tpudsp.chains import AMConfig, AMReceiver

    n = 125_000
    t = np.arange(n)
    iq = ((1 + 0.5 * np.sin(2 * np.pi * 0.0005 * t)) * 0.3
          * np.exp(2j * np.pi * 0.00015 * t)).astype(np.complex64)
    with debug_nans():
        rx = AMReceiver(AMConfig(), block_len=n)
        pcm = rx(iq)
        assert np.isfinite(pcm).all()
