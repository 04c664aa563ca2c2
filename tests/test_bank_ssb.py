"""SSB paths of the receiver bank: 'usb'/'lsb' channels must perform real
sideband selection (ADVICE round-1 high finding: the one-sided h2s taps
were built but never applied, so usb and lsb produced identical DSB
audio). These tests pin the fix: a single-sideband signal must appear in
the matching demod channel and be rejected (>30 dB) by the opposite one,
mirroring tests/test_chains.py::test_ssb_receiver_chain at bank level."""

import numpy as np
import pytest

from tpudsp.chains import BankConfig, ReceiverBank
from tpudsp.parallel import make_mesh
from tpudsp.parallel.bank import ShardedBank
from tests.util import snr_db


IQ_RATE = 2_400_000.0


def _ssb_tone(n, fc, df):
    """A pure tone at fc + df Hz: USB content of a carrier at fc when
    df > 0, LSB content when df < 0."""
    t = np.arange(n)
    return (0.5 * np.exp(2j * np.pi * (fc + df) / IQ_RATE * t)).astype(
        np.complex64)


def _tone_band_power(audio, fs, f0, halfwidth=60.0):
    w = np.hanning(len(audio))
    spec = np.abs(np.fft.rfft(audio * w)) ** 2
    freqs = np.fft.rfftfreq(len(audio), 1 / fs)
    band = (freqs > f0 - halfwidth) & (freqs < f0 + halfwidth)
    return spec[band].sum()


@pytest.mark.parametrize("side", ["usb", "lsb"])
def test_bank_ssb_selects_sideband(side):
    """Two channels tuned to the SAME carrier, one usb and one lsb: a
    single-sideband tone shows up only in the matching channel."""
    n = 480_000
    fc = 300_000.0
    f_msg = 2000.0
    df = f_msg if side == "usb" else -f_msg
    iq = _ssb_tone(n, fc, df)
    cfg = BankConfig(freqs=(fc, fc), iq_rate=IQ_RATE, demod=("usb", "lsb"))
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    settle = audio.shape[1] // 4
    p_usb = _tone_band_power(audio[0, settle:], fs_a, f_msg)
    p_lsb = _tone_band_power(audio[1, settle:], fs_a, f_msg)
    match, other = (p_usb, p_lsb) if side == "usb" else (p_lsb, p_usb)
    ratio_db = 10 * np.log10(match / (other + 1e-30))
    assert ratio_db > 30.0, ratio_db


def test_bank_ssb_message_recovery_uniform_string():
    """Uniform demod='usb' bank recovers the USB message tone itself
    (unit gain up to de-emphasis), not just a power ratio."""
    n = 480_000
    fc = 300_000.0
    f_msg = 2000.0
    iq = _ssb_tone(n, fc, f_msg)
    cfg = BankConfig(freqs=(fc,), iq_rate=IQ_RATE, demod="usb")
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))[0]
    fs_a = cfg.audio_rate
    settle = len(audio) // 4
    tail = audio[settle:]
    # dominant spectral line at the message frequency
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    freqs = np.fft.rfftfreq(len(tail), 1 / fs_a)
    assert abs(freqs[np.argmax(spec[3:]) + 3] - f_msg) < 40.0
    # amplitude ~ 0.5 * 2 (analytic-taps gain) * deemph(|H(f_msg)|)
    from tpudsp.design import iirdes
    b0, a = iirdes.deemphasis_coeffs(fs_a)
    hd = abs(b0 / (1 - a * np.exp(-2j * np.pi * f_msg / fs_a)))
    amp = np.sqrt(2 * np.mean(tail ** 2))
    assert 0.7 * hd < amp < 1.3 * hd, (amp, hd)


def test_bank_ssb_streaming_invariance():
    """Two half blocks == one full block (carried y1_tail state)."""
    n = 240_000
    fc = 300_000.0
    iq = _ssb_tone(2 * n, fc, 1500.0) + _ssb_tone(2 * n, fc, -2500.0)
    cfg = BankConfig(freqs=(fc, fc), iq_rate=IQ_RATE, demod=("usb", "lsb"))
    full = np.asarray(ReceiverBank(cfg, block_len=2 * n)(iq))
    bank2 = ReceiverBank(cfg, block_len=n)
    split = np.concatenate(
        [np.asarray(bank2(iq[:n])), np.asarray(bank2(iq[n:]))], axis=1)
    assert full.shape == split.shape
    assert np.allclose(full, split, atol=1e-5), np.abs(full - split).max()


def test_sharded_bank_ssb_matches_single_chip():
    """SSB bank over a (channel, time) mesh: y1_tail rides the time halo;
    shards must reproduce the single-chip bank."""
    n = 400_000
    fc = 300_000.0
    iq = _ssb_tone(n, fc, 1500.0) + _ssb_tone(n, fc, -2500.0)
    cfg = BankConfig(freqs=(fc, fc, fc, fc), iq_rate=IQ_RATE,
                     demod=("usb", "lsb", "usb", "lsb"))
    y_ref = np.asarray(ReceiverBank(cfg, block_len=n)(iq))
    sb = ShardedBank(cfg, make_mesh(2, 4), block_len=n)
    y = np.asarray(sb(iq))
    assert y.shape == y_ref.shape
    assert snr_db(y_ref, y) > 80.0


def test_mixed_bank_fm_and_ssb():
    """EP-analog dispatch with an SSB channel next to an FM channel."""
    n = 480_000
    t = np.arange(n)
    f_fm, f_ssb = 400_000.0, -300_000.0
    dev = 75_000.0
    phase = 2 * np.pi * np.cumsum(
        f_fm / IQ_RATE + dev / IQ_RATE * np.sin(2 * np.pi * 1500.0 / IQ_RATE * t))
    iq = (0.5 * np.exp(1j * phase)).astype(np.complex64) + _ssb_tone(
        n, f_ssb, 2000.0)
    cfg = BankConfig(freqs=(f_fm, f_ssb), iq_rate=IQ_RATE,
                     demod=("fm", "usb"), kd=dev / (IQ_RATE / 10))
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    settle = audio.shape[1] // 4
    for c, f_msg in ((0, 1500.0), (1, 2000.0)):
        tail = audio[c, settle:] - audio[c, settle:].mean()
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / fs_a)
        assert abs(freqs[np.argmax(spec[3:]) + 3] - f_msg) < 40.0, c
