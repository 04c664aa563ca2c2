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
