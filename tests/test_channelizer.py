"""Polyphase FFT channelizer tests (BASELINE config 4 scaled down for CPU):
tone routing, passband gain, adjacent-channel rejection, block invariance,
and the channelized demod bank."""

import numpy as np

from tpudsp.chains.channelizer import (
    ChannelizedBank, ChannelizedBankConfig, Channelizer, ChannelizerConfig,
)
from tests.util import snr_db


def test_tone_routing_and_rejection():
    C = 64
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=8, iq_rate=6_400_000.0)
    ch = Channelizer(cfg, block_len=C * 512)
    n = C * 512
    t = np.arange(n)
    targets = [3, 17, C - 5]  # includes a negative-frequency channel
    x = sum(np.exp(2j * np.pi * (c / C) * t) for c in targets)
    Y = np.asarray(ch(x.astype(np.complex64)))
    # settle past the prototype group delay (T frames)
    P = np.mean(np.abs(Y[32:]) ** 2, axis=0)
    for c in targets:
        assert P[c] > 0.5, (c, P[c])  # tone lands in its channel, gain ~1
    quiet = [c for c in range(C) if min(abs(c - tc) for tc in targets) > 1
             and min(abs(c - tc) for tc in targets) < C - 1]
    assert 10 * np.log10(P[targets[0]] / max(P[q] for q in quiet)) > 50.0


def test_channel_passband_gain_and_offset_tone():
    """A tone slightly off a channel center appears in that channel at the
    offset frequency with ~unity gain."""
    C = 32
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=12, iq_rate=3_200_000.0)
    ch = Channelizer(cfg, block_len=C * 1024)
    n = C * 1024
    t = np.arange(n)
    c0 = 5
    f_off = 0.2 / C  # 20% of channel spacing off center
    x = np.exp(2j * np.pi * (c0 / C + f_off) * t)
    Y = np.asarray(ch(x.astype(np.complex64)))[64:, c0]
    m = np.arange(len(Y)) + 64
    # channel stream sampled at frame rate: expected e^{2 pi j f_off * C * m}
    ref = np.exp(2j * np.pi * f_off * C * m)
    a = np.vdot(ref, Y) / np.vdot(ref, ref)
    assert abs(abs(a) - 1.0) < 0.1
    assert snr_db(a * ref, Y) > 40.0


def test_block_invariance():
    C = 32
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=6, iq_rate=3_200_000.0)
    rng = np.random.default_rng(0)
    n = C * 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    ch1 = Channelizer(cfg, block_len=n)
    Y1 = np.asarray(ch1(x))
    ch2 = Channelizer(cfg, block_len=n // 4)
    Y2 = np.concatenate([np.asarray(ch2(x[i:i + n // 4]))
                         for i in range(0, n, n // 4)], axis=0)
    np.testing.assert_allclose(Y1, Y2, atol=1e-4)


def test_channelized_fm_bank():
    """FM stations on two channel centers -> demodulated audio in the
    matching bank rows."""
    C = 64
    iq_rate = 6_400_000.0
    chan_rate = iq_rate / C  # 100 kHz
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8,
                                      iq_rate=iq_rate),
        demod="fm", kd=25_000.0 / chan_rate)
    n = C * 4096
    t = np.arange(n)
    stations = {10: 1000.0, 40: 2300.0}
    x = 0
    for c, f_msg in stations.items():
        m = np.sin(2 * np.pi * f_msg / iq_rate * t)
        # deviation 25 kHz at the input rate
        x = x + np.exp(1j * (2 * np.pi * (c / C) * t
                             + 2 * np.pi * (25_000.0 / iq_rate)
                             * np.cumsum(m)))
    bank = ChannelizedBank(cfg, block_len=n)
    audio = np.asarray(bank((x / len(stations)).astype(np.complex64)))
    assert audio.shape == (C, n // C)
    for c, f_msg in stations.items():
        tail = audio[c, audio.shape[1] // 4:]
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1.0 / chan_rate)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 0.02 * chan_rate, (c, peak, f_msg)


def test_channelized_am_bank_coherent():
    """AM stations through the channelized bank with the coherent back
    end (AGC + carrier PLL + DC tracker): audio recovered DC-free, with
    carried state across blocks (streamed in halves)."""
    C = 32
    iq_rate = 3_200_000.0
    chan_rate = iq_rate / C  # 100 kHz
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8,
                                      iq_rate=iq_rate),
        demod="am", am_coherent=True)
    # the DC tracker's memory is ~2000 channel-rate samples (DC_RHO
    # 0.9995): give it >= 6 time constants before measuring
    n = C * 16384
    t = np.arange(n)
    stations = {5: 1000.0, 20: 2500.0}
    x = 0
    for c, f_msg in stations.items():
        m = np.sin(2 * np.pi * f_msg / iq_rate * t)
        # small carrier offset within the PLL pull range
        x = x + (1 + 0.5 * m) * 0.4 * np.exp(
            2j * np.pi * ((c / C) + 15.0 / iq_rate) * t)
    x = (x / len(stations)).astype(np.complex64)
    bank = ChannelizedBank(cfg, block_len=n // 2)
    audio = np.concatenate(
        [np.asarray(bank(x[: n // 2])), np.asarray(bank(x[n // 2:]))], axis=1)
    assert audio.shape == (C, n // C)
    for c, f_msg in stations.items():
        tail = audio[c, 3 * audio.shape[1] // 4:]
        assert abs(tail.mean()) < 0.05 * np.abs(tail).max(), (c, tail.mean())
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1.0 / chan_rate)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 0.02 * chan_rate, (c, peak, f_msg)


def _os2_oracle(h, C, x, M):
    """Brute-force Y[m,c] = sum_l h[l] x[mR-l] e^{2 pi j c l / C}
    e^{-2 pi j c m R / C}, R = C/2, x[<0] = 0."""
    R = C // 2
    L = len(h)
    Y = np.zeros((M, C), np.complex128)
    cs = np.arange(C)
    for m in range(M):
        idx = m * R - np.arange(L)
        xs = np.where(idx >= 0, x[np.maximum(idx, 0)], 0)
        for c in cs:
            Y[m, c] = np.sum(h * xs * np.exp(2j * np.pi * c * np.arange(L) / C)) \
                * np.exp(-2j * np.pi * c * m * R / C)
    return Y


def test_oversampled_matches_bruteforce_oracle():
    """os=2 output equals the direct filter-bank definition exactly."""
    from tpudsp.chains.channelizer import build, channelize
    C, T = 8, 4
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=T, iq_rate=1.0,
                            oversample=2)
    Ht, st = build(cfg)
    h = np.asarray(Ht).reshape(-1)  # h[t*C+p]
    rng = np.random.default_rng(3)
    n = C * 16
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    _, Y = channelize(Ht, st, x, os=2)
    Y = np.asarray(Y)
    M = Y.shape[0]
    assert M == 2 * n // C
    want = _os2_oracle(h.astype(np.float64), C, x.astype(np.complex128), M)
    np.testing.assert_allclose(Y, want, atol=5e-5)


def test_oversampled_block_invariance():
    C = 32
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=6, iq_rate=3_200_000.0,
                            oversample=2)
    rng = np.random.default_rng(1)
    n = C * 256
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    ch1 = Channelizer(cfg, block_len=n)
    Y1 = np.asarray(ch1(x))
    ch2 = Channelizer(cfg, block_len=n // 4)
    Y2 = np.concatenate([np.asarray(ch2(x[i:i + n // 4]))
                         for i in range(0, n, n // 4)], axis=0)
    np.testing.assert_allclose(Y1, Y2, atol=1e-4)


def test_oversampled_flat_passband_at_channel_edge():
    """A tone at 60% of the channel spacing off center: past the critical
    bank's channel Nyquist (0.5 spacing) and prototype cutoff (0.55/C), so
    the os=1 bank attenuates it -- while the 2x bank with a full-width
    prototype (cutoff 0.95/C) passes it at ~unity gain, alias-free (the 2x
    channel Nyquist spans the full spacing). The motivating property of
    the oversampled PFB."""
    C = 32
    n = C * 2048
    t = np.arange(n)
    c0 = 5
    f_off = 0.6 / C
    x = np.exp(2j * np.pi * (c0 / C + f_off) * t).astype(np.complex64)

    cfg2 = ChannelizerConfig(nchan=C, taps_per_branch=12,
                             iq_rate=3_200_000.0, oversample=2,
                             cutoff_frac=0.95)
    Y2 = np.asarray(Channelizer(cfg2, block_len=n)(x))[128:, c0]
    m = np.arange(len(Y2)) + 128
    ref = np.exp(2j * np.pi * f_off * (C // 2) * m)  # offset at hop rate
    a = np.vdot(ref, Y2) / np.vdot(ref, ref)
    assert abs(abs(a) - 1.0) < 0.05, abs(a)
    assert snr_db(a * ref, Y2) > 40.0

    cfg1 = ChannelizerConfig(nchan=C, taps_per_branch=12,
                             iq_rate=3_200_000.0, oversample=1)
    Y1 = np.asarray(Channelizer(cfg1, block_len=n)(x))[64:, c0]
    g1 = np.sqrt(np.mean(np.abs(Y1) ** 2))
    assert g1 < 0.5  # critical bank attenuates past its cutoff


def test_oversampled_channelized_fm_bank():
    """The demod bank runs unchanged behind the 2x channelizer (channel
    rate doubles; kd is normalized at the channel rate)."""
    C = 64
    iq_rate = 6_400_000.0
    cfgc = ChannelizerConfig(nchan=C, taps_per_branch=8, iq_rate=iq_rate,
                             oversample=2, cutoff_frac=0.95)
    chan_rate = cfgc.chan_rate  # 200 kHz
    cfg = ChannelizedBankConfig(channelizer=cfgc, demod="fm",
                                kd=25_000.0 / chan_rate)
    n = C * 4096
    t = np.arange(n)
    stations = {10: 1000.0, 40: 2300.0}
    x = 0
    for c, f_msg in stations.items():
        m = np.sin(2 * np.pi * f_msg / iq_rate * t)
        x = x + np.exp(1j * (2 * np.pi * (c / C) * t
                             + 2 * np.pi * (25_000.0 / iq_rate)
                             * np.cumsum(m)))
    bank = ChannelizedBank(cfg, block_len=n)
    audio = np.asarray(bank((x / len(stations)).astype(np.complex64)))
    assert audio.shape == (C, 2 * n // C)
    for c, f_msg in stations.items():
        tail = audio[c, audio.shape[1] // 4:]
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1.0 / chan_rate)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 0.02 * chan_rate, (c, peak, f_msg)


def test_channelized_bank_raw_i16_matches_converted():
    """ChannelizedBank(input_format='i16'): raw int16 wire samples
    through the PFB (scale folded into the prototype branches, int16
    carried tail) must match the c64 bank on converted input, streamed
    and for both os=1 and os=2."""
    from tests.util import snr_db

    C = 32
    iq_rate = 3_200_000.0
    n = C * 2048
    t = np.arange(2 * n)
    x = sum(np.exp(1j * (2 * np.pi * (c / C) * t
                         + 2 * np.pi * 0.05 / C * np.cumsum(
                             np.sin(2 * np.pi * 0.0005 * (i + 1) * t))))
            for i, c in enumerate((4, 19))) / 2
    i16 = np.stack([np.round(np.real(x) * 32767 * 0.5),
                    np.round(np.imag(x) * 32767 * 0.5)],
                   axis=1).astype(np.int16)
    c64 = ((i16[:, 0] + 1j * i16[:, 1]) / 32767.0).astype(np.complex64)

    for os_, cf in ((1, 0.55), (2, 0.95)):
        cfg = ChannelizedBankConfig(
            channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                          iq_rate=iq_rate, oversample=os_,
                                          cutoff_frac=cf),
            demod="fm", kd=0.25)
        b_c = ChannelizedBank(cfg, block_len=n)
        b_i = ChannelizedBank(cfg, block_len=n, input_format="i16")
        for b in range(2):
            y_c = np.asarray(b_c(c64[b * n:(b + 1) * n]))
            y_i = np.asarray(b_i(i16[b * n:(b + 1) * n]))
            for ch in (4, 19):
                assert snr_db(y_c[ch], y_i[ch]) > 90.0, (os_, b, ch)


def test_channelized_bank_raw_u8_matches_converted():
    """ChannelizedBank(input_format='u8') — RTL-SDR wire format through
    the PFB: the 1/127.5 scale folds into the prototype branches and the
    -127.5 offset is a per-branch constant subtracted before the channel
    IFFT (chains/channelizer.py channelize_i16 u8 branch); must match
    the c64 bank on converted input, streamed, os=1 and os=2 (block 0
    carries the half-LSB tail-init transient, block 1 pins tight)."""
    from tests.util import snr_db

    C = 32
    iq_rate = 3_200_000.0
    n = C * 2048
    t = np.arange(2 * n)
    x = sum(np.exp(1j * (2 * np.pi * (c / C) * t
                         + 2 * np.pi * 0.05 / C * np.cumsum(
                             np.sin(2 * np.pi * 0.0005 * (i + 1) * t))))
            for i, c in enumerate((4, 19))) / 2
    u8 = np.stack([np.round(np.real(x) * 127.5 * 0.9 + 127.5),
                   np.round(np.imag(x) * 127.5 * 0.9 + 127.5)],
                  axis=1).clip(0, 255).astype(np.uint8)
    c64 = ((u8[:, 0] - 127.5) / 127.5
           + 1j * (u8[:, 1] - 127.5) / 127.5).astype(np.complex64)

    for os_, cf in ((1, 0.55), (2, 0.95)):
        cfg = ChannelizedBankConfig(
            channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                          iq_rate=iq_rate, oversample=os_,
                                          cutoff_frac=cf),
            demod="fm", kd=0.25)
        b_c = ChannelizedBank(cfg, block_len=n)
        b_u = ChannelizedBank(cfg, block_len=n, input_format="u8")
        # block 0: the uint8 tail init (127 ~ -half-LSB, not exactly
        # zero) rings the first T-1 PFB frames, which the FM
        # discriminator amplifies; skip that documented transient
        for b, (floor, skip) in enumerate(((60.0, 64), (85.0, 0))):
            y_c = np.asarray(b_c(c64[b * n:(b + 1) * n]))
            y_u = np.asarray(b_u(u8[b * n:(b + 1) * n]))
            for ch in (4, 19):
                got = snr_db(y_c[ch, skip:], y_u[ch, skip:])
                assert got > floor, (os_, b, ch, got)


def test_channelizer_conv_engine_matches_shift():
    """engine='conv' (one-pass depthwise dilated conv) must reproduce the
    default shift engine across os=1/2, c64/i16/u8 input, streamed."""
    from tests.util import snr_db

    C = 32
    iq_rate = 3_200_000.0
    n = C * 1024
    rng = np.random.default_rng(11)
    x = ((rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n))
         * 0.25).astype(np.complex64)
    i16 = np.stack([np.round(x.real * 32767 * 0.9),
                    np.round(x.imag * 32767 * 0.9)],
                   axis=1).astype(np.int16)
    u8 = np.stack([np.round(x.real * 127.5 * 0.9 + 127.5),
                   np.round(x.imag * 127.5 * 0.9 + 127.5)],
                  axis=1).clip(0, 255).astype(np.uint8)

    for os_, cf in ((1, 0.55), (2, 0.95)):
        for fmt, w in (("c64", x), ("i16", i16), ("u8", u8)):
            def mk(engine):
                cfg = ChannelizerConfig(nchan=C, taps_per_branch=6,
                                        iq_rate=iq_rate, oversample=os_,
                                        cutoff_frac=cf, engine=engine)
                bc = ChannelizedBankConfig(channelizer=cfg, demod="am")
                return ChannelizedBank(bc, block_len=n, input_format=fmt)

            b_s, b_c = mk("shift"), mk("conv")
            for b in range(2):
                y_s = np.asarray(b_s(w[b * n:(b + 1) * n]))
                y_c = np.asarray(b_c(w[b * n:(b + 1) * n]))
                got = snr_db(y_s, y_c)
                assert got > 110.0, (os_, fmt, b, got)


def test_channelized_bank_mixed_demod():
    """Per-channel fm/am demod tuples (EP, reference wrapper.cpp:189-199
    composition): each mixed row must match the corresponding row of a
    uniform bank of that type on the same input — the dispatch is a
    mask-select over batched bases with the coherent back end gathered
    onto its static AM subgroup."""
    import numpy as np
    import jax.numpy as jnp
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig,
                                           bank_build, bank_step)
    from functools import partial

    C = 16
    n = C * 2048
    rng = np.random.default_rng(11)
    x = ((rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.1
         ).astype(np.complex64)
    ccfg = ChannelizerConfig(nchan=C, taps_per_branch=8)
    demods = tuple("am" if i % 3 == 0 else "fm" for i in range(C))
    for coh in (False, True):
        cfg_mix = ChannelizedBankConfig(channelizer=ccfg, demod=demods,
                                        am_coherent=coh)
        pm, sm = bank_build(cfg_mix)
        _, (a_mix, _) = bank_step(pm, sm, jnp.asarray(x), cfg=cfg_mix)
        a_mix = np.asarray(a_mix)
        for kind in ("fm", "am"):
            cfg_u = ChannelizedBankConfig(channelizer=ccfg, demod=kind,
                                          am_coherent=coh)
            pu, su = bank_build(cfg_u)
            _, (a_u, _) = bank_step(pu, su, jnp.asarray(x), cfg=cfg_u)
            a_u = np.asarray(a_u)
            rows = [i for i, d in enumerate(demods) if d == kind]
            err = a_mix[rows] - a_u[rows]
            sig = np.mean(a_u[rows] ** 2)
            snr = 10 * np.log10(sig / (np.mean(err ** 2) + 1e-30))
            assert snr > 100.0, (kind, coh, snr)


def test_channelized_bank_mixed_demod_validation():
    import pytest
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig)
    ccfg = ChannelizerConfig(nchan=8, taps_per_branch=8)
    with pytest.raises(ValueError):
        ChannelizedBankConfig(channelizer=ccfg, demod=("fm",) * 7)
    with pytest.raises(ValueError):
        ChannelizedBankConfig(channelizer=ccfg,
                              demod=("fm",) * 7 + ("usb",))
