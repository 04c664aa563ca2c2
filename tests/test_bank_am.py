"""AM-envelope path of the receiver bank (config 3 covers AM and FM)."""

import numpy as np

from tpudsp.chains import BankConfig, ReceiverBank


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
