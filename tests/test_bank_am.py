"""AM paths of the receiver bank: envelope (default) and the coherent
back end (cfg.am_coherent: per-channel AGC + carrier PLL + DC tracker)."""

import numpy as np
import pytest

from tpudsp.chains import BankConfig, ReceiverBank


def _tone_peak(audio_tail, fs):
    spec = np.abs(np.fft.rfft(audio_tail * np.hanning(len(audio_tail))))
    freqs = np.fft.rfftfreq(len(audio_tail), 1 / fs)
    return freqs[np.argmax(spec[3:]) + 3]


def test_am_bank_envelope_recovery():
    iq_rate = 2_400_000.0
    n = 500_000
    t = np.arange(n)
    f1, f2 = 300_000.0, -500_000.0
    m1 = np.sin(2 * np.pi * 1000.0 / iq_rate * t)
    m2 = np.sin(2 * np.pi * 2000.0 / iq_rate * t)
    s1 = (1 + 0.5 * m1) * np.exp(2j * np.pi * f1 / iq_rate * t)
    s2 = (1 + 0.5 * m2) * np.exp(2j * np.pi * f2 / iq_rate * t)
    iq = (0.5 * (s1 + s2)).astype(np.complex64)
    cfg = BankConfig(freqs=(f1, f2), iq_rate=iq_rate, demod="am")
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    for c, f_msg in ((0, 1000.0), (1, 2000.0)):
        tail = audio[c, audio.shape[1] // 4:]
        tail = tail - tail.mean()  # envelope has a DC term
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / fs_a)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 40.0, (c, peak)


def _am_iq(iq_rate, n, chans):
    """Sum of AM carriers: chans = ((center_hz, offset_hz, f_msg), ...)."""
    t = np.arange(n)
    iq = np.zeros(n, np.complex128)
    for fc, df, fm in chans:
        m = np.sin(2 * np.pi * fm / iq_rate * t)
        iq += (1 + 0.5 * m) * 0.3 * np.exp(
            2j * np.pi * (fc + df) / iq_rate * t)
    return iq.astype(np.complex64)


def test_am_bank_coherent_recovery_and_dc():
    """Coherent AM channels (AGC + carrier PLL + DC tracker) recover the
    message with the carrier DC removed -- unlike the raw envelope path,
    whose audio rides on the carrier level."""
    iq_rate = 2_400_000.0
    n = 600_000
    f1, f2 = 300_000.0, -500_000.0
    iq = _am_iq(iq_rate, n, ((f1, 30.0, 1000.0), (f2, -20.0, 2000.0)))
    cfg = BankConfig(freqs=(f1, f2), iq_rate=iq_rate, demod="am",
                     am_coherent=True)
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    for c, f_msg in ((0, 1000.0), (1, 2000.0)):
        tail = audio[c, audio.shape[1] // 2:]
        assert abs(tail.mean()) < 0.05 * np.abs(tail).max(), (c, tail.mean())
        peak = _tone_peak(tail, fs_a)  # NO mean subtraction
        assert abs(peak - f_msg) < 40.0, (c, peak)


def test_am_bank_coherent_streaming_invariance():
    """Two half blocks == one full block (carried front/dc state)."""
    iq_rate = 2_400_000.0
    n = 500_000
    f1 = 300_000.0
    iq = _am_iq(iq_rate, n, ((f1, 25.0, 1000.0),))
    cfg = BankConfig(freqs=(f1,), iq_rate=iq_rate, demod="am",
                     am_coherent=True)
    full = np.asarray(ReceiverBank(cfg, block_len=n)(iq))
    bank2 = ReceiverBank(cfg, block_len=n // 2)
    split = np.concatenate(
        [np.asarray(bank2(iq[: n // 2])), np.asarray(bank2(iq[n // 2:]))],
        axis=1)
    assert full.shape == split.shape
    tail = slice(full.shape[1] // 4, None)
    err = full[:, tail] - split[:, tail]
    snr = 10 * np.log10((full[:, tail] ** 2).mean() / ((err ** 2).mean() + 1e-30))
    assert snr > 55.0, snr


def test_am_bank_coherent_pallas_matches_xla():
    iq_rate = 2_400_000.0
    n = 500_000
    f1, f2 = 300_000.0, -500_000.0
    iq = _am_iq(iq_rate, n, ((f1, 30.0, 1000.0), (f2, -20.0, 2000.0)))
    cfg = BankConfig(freqs=(f1, f2), iq_rate=iq_rate, demod="am",
                     am_coherent=True)
    ax = np.asarray(ReceiverBank(cfg, block_len=n, backend="xla")(iq))
    ap = np.asarray(ReceiverBank(cfg, block_len=n, backend="pallas")(iq))
    err = ax - ap
    snr = 10 * np.log10((ax ** 2).mean() / ((err ** 2).mean() + 1e-30))
    assert snr > 60.0, snr


def test_mixed_bank_with_coherent_am():
    """EP-analog dispatch with the coherent AM back end: FM channel via
    freqdem, AM channel via the full feedback back end, one bank."""
    iq_rate = 2_400_000.0
    n = 600_000
    t = np.arange(n)
    f_fm, f_am = 400_000.0, -300_000.0
    # FM channel: 1.5 kHz tone, 75 kHz deviation
    dev = 75_000.0
    phase = 2 * np.pi * np.cumsum(
        f_fm / iq_rate + dev / iq_rate * np.sin(2 * np.pi * 1500.0 / iq_rate * t))
    s_fm = np.exp(1j * phase)
    iq = (0.5 * s_fm + _am_iq(iq_rate, n, ((f_am, 20.0, 2000.0), ))).astype(
        np.complex64)
    cfg = BankConfig(freqs=(f_fm, f_am), iq_rate=iq_rate, demod=("fm", "am"),
                     am_coherent=True, kd=dev / (iq_rate / 10))
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    for c, f_msg in ((0, 1500.0), (1, 2000.0)):
        tail = audio[c, audio.shape[1] // 2:]
        peak = _tone_peak(tail - tail.mean(), fs_a)
        assert abs(peak - f_msg) < 40.0, (c, peak)
    # the coherent AM channel's audio is DC-free without mean subtraction
    am_tail = audio[1, audio.shape[1] // 2:]
    assert abs(am_tail.mean()) < 0.05 * np.abs(am_tail).max()


def test_bank_raw_i16_input_matches_converted():
    """ReceiverBank(input_format='i16'): raw int16 wire samples through
    the modulated-taps front end (scale folded into taps, int16 carried
    tail) must match the c64 bank on converted input, streamed."""
    from tpudsp.chains.bank import BankConfig, ReceiverBank
    from tests.util import snr_db

    fs = 2_400_000.0
    cfg = BankConfig(freqs=(-500_000.0, 0.0, 400_000.0), iq_rate=fs,
                     demod=("fm", "am", "fm"))
    n = 200_000
    t = np.arange(2 * n)
    x = (0.4 * np.exp(2j * np.pi * (400_000.0 / fs) * t
                      + 0.2j * np.sin(2 * np.pi * 0.001 * t))
         + 0.3 * (1 + 0.5 * np.sin(2 * np.pi * 0.0005 * t)))
    i16 = np.stack([np.round(np.real(x) * 32767 * 0.5),
                    np.round(np.imag(x) * 32767 * 0.5)],
                   axis=1).astype(np.int16)
    c64 = ((i16[:, 0] + 1j * i16[:, 1]) / 32767.0).astype(np.complex64)

    b_c = ReceiverBank(cfg, block_len=n)
    b_i = ReceiverBank(cfg, block_len=n, input_format="i16")
    for b in range(2):
        y_c = np.asarray(b_c(c64[b * n:(b + 1) * n]))
        y_i = np.asarray(b_i(i16[b * n:(b + 1) * n]))
        assert snr_db(y_c, y_i) > 90.0, b


def test_bank_raw_u8_input_matches_converted():
    """ReceiverBank(input_format='u8') — RTL-SDR wire format: the affine
    (b-127.5)/127.5 conversion folds into scaled modulated taps + a
    per-channel DC subtraction inside the wide front-end matmul
    (kernels/decimate.py strided_cfir_matmul_wide_u8); output must match
    the c64 bank on converted input, streamed (block 0 carries the
    documented half-LSB tail-init transient, so block 1 pins tight)."""
    from tpudsp.chains.bank import BankConfig, ReceiverBank
    from tests.util import snr_db

    fs = 2_400_000.0
    # every channel carries a real signal: an empty FM channel
    # arctan2-demodulates float-level residuals, which the u8 path's
    # large-term DC cancellation legitimately perturbs
    cfg = BankConfig(freqs=(-500_000.0, 0.0, 400_000.0), iq_rate=fs,
                     demod=("fm", "am", "fm"))
    n = 200_000
    t = np.arange(2 * n)
    x = (0.4 * np.exp(2j * np.pi * (400_000.0 / fs) * t
                      + 0.2j * np.sin(2 * np.pi * 0.001 * t))
         + 0.25 * np.exp(-2j * np.pi * (500_000.0 / fs) * t
                         + 0.3j * np.sin(2 * np.pi * 0.002 * t))
         + 0.3 * (1 + 0.5 * np.sin(2 * np.pi * 0.0005 * t)))
    u8 = np.stack([np.round(np.real(x) * 127.5 * 0.5 + 127.5),
                   np.round(np.imag(x) * 127.5 * 0.5 + 127.5)],
                  axis=1).clip(0, 255).astype(np.uint8)
    c64 = ((u8[:, 0] - 127.5) / 127.5
           + 1j * (u8[:, 1] - 127.5) / 127.5).astype(np.complex64)

    b_c = ReceiverBank(cfg, block_len=n)
    b_u = ReceiverBank(cfg, block_len=n, input_format="u8")
    # block 0: the uint8 tail init (127 ~ -half-LSB, not exactly zero)
    # rings the front filter for taps1-1 input samples -> a few audio
    # samples; skip that documented transient, then pin tight
    for b, (floor, skip) in enumerate(((60.0, 32), (85.0, 0))):
        y_c = np.asarray(b_c(c64[b * n:(b + 1) * n]))
        y_u = np.asarray(b_u(u8[b * n:(b + 1) * n]))
        got = snr_db(y_c[:, skip:], y_u[:, skip:])
        assert got > floor, (b, got)

    with pytest.raises(TypeError, match="uint8"):
        b_u(c64[:n])
