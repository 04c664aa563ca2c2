"""Chain integration tests (SURVEY.md section 4 class 3): the BASELINE
configs as end-to-end pipelines, including fused-vs-composed equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudsp.chains import (
    AMConfig, AMReceiver, BankConfig, ReceiverBank, WBFMStereoReceiver,
    mono_receiver,
)
from tests.util import snr_db, noise


def _am_iq(n, iq_rate=2_000_000.0, f_msg=1000.0, mod=0.5, f_off=200.0):
    t = np.arange(n)
    msg = np.sin(2 * np.pi * f_msg / iq_rate * t)
    env = (1.0 + mod * msg) * 0.3
    return (env * np.exp(2j * np.pi * f_off / iq_rate * t)).astype(np.complex64), msg


def test_am_receiver_fused_equals_composed():
    """LTI commutation: folding the bandpass into the polyphase prototype
    must reproduce the composed chain."""
    n = 250_000
    iq, _ = _am_iq(n)
    cfg = AMConfig()
    rx_f = AMReceiver(cfg, block_len=n, plan="fused", exact=True)
    rx_c = AMReceiver(cfg, block_len=n, plan="composed", exact=True)
    assert rx_f.plan == "fused"
    pcm_f = np.asarray(rx_f(iq))
    pcm_c = np.asarray(rx_c(iq))
    assert pcm_f.shape == pcm_c.shape == (rx_f.n_out,)
    # identical up to float reordering of the same LTI math
    assert snr_db(pcm_c[200:], pcm_f[200:]) > 70.0


def test_am_receiver_recovers_audio():
    n = 1_000_000  # blocks of 250k: 250000 * 0.024 = 6000 outputs exactly
    iq, _ = _am_iq(n)
    rx = AMReceiver(AMConfig(), block_len=n // 4, plan="fused", exact=False)
    pcm = []
    for i in range(0, n, n // 4):
        pcm.append(np.asarray(rx(iq[i:i + n // 4])))
    pcm = np.concatenate(pcm)
    tail = pcm[len(pcm) // 2:]
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    freqs = np.fft.rfftfreq(len(tail), 1 / 48000.0)
    peak = freqs[np.argmax(spec[5:]) + 5]
    assert abs(peak - 1000.0) < 20.0
    inband = spec[(freqs > 900) & (freqs < 1100)].max()
    outband = spec[freqs > 1500].max()
    assert 20 * np.log10(inband / outband) > 40.0


def test_am_receiver_block_invariance():
    """Same stream split differently -> same audio (carried state correct)."""
    n = 500_000
    iq, _ = _am_iq(n)
    cfg = AMConfig()
    rx1 = AMReceiver(cfg, block_len=n, plan="fused", exact=True)
    y1 = np.asarray(rx1(iq))
    rx2 = AMReceiver(cfg, block_len=n // 4, plan="fused", exact=True)
    y2 = np.concatenate([np.asarray(rx2(iq[i:i + n // 4]))
                         for i in range(0, n, n // 4)])
    assert y1.shape == y2.shape
    assert snr_db(y1[100:], y2[100:]) > 60.0


def test_fm_bank_recovers_per_channel_audio():
    """Config 3: shared stream carrying two FM stations; each channel's
    audio comes out of its own bank slot."""
    iq_rate = 2_400_000.0
    n = 500_000  # multiple of decim1*decim2 = 50
    t = np.arange(n)
    dev = 75_000.0
    kd = dev / iq_rate   # synth: inst. freq = kd*fs*m -> +/-75 kHz peak
    f1, f2 = 250_000.0, -400_000.0
    m1 = np.sin(2 * np.pi * 1000.0 / iq_rate * t)
    m2 = np.sin(2 * np.pi * 3000.0 / iq_rate * t)
    s1 = np.exp(1j * (2 * np.pi * f1 / iq_rate * t
                      + 2 * np.pi * kd * np.cumsum(m1)))
    s2 = np.exp(1j * (2 * np.pi * f2 / iq_rate * t
                      + 2 * np.pi * kd * np.cumsum(m2)))
    iq = (0.5 * (s1 + s2)).astype(np.complex64)
    # bank kd is normalized at the channel rate (decim1 x input sample)
    cfg = BankConfig(freqs=(f1, f2), iq_rate=iq_rate, demod="fm", kd=kd * 10)
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    assert audio.shape == (2, n // 50)
    fs_a = cfg.audio_rate
    for c, f_msg in ((0, 1000.0), (1, 3000.0)):
        tail = audio[c, audio.shape[1] // 4:]
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / fs_a)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 40.0, (c, peak)


def test_fm_bank_block_invariance():
    iq_rate = 2_400_000.0
    n = 200_000
    iq = noise(n, complex_out=True, seed=9).astype(np.complex64)
    cfg = BankConfig(freqs=(100_000.0, -200_000.0), iq_rate=iq_rate, kd=0.3125)
    b1 = ReceiverBank(cfg, block_len=n)
    y1 = np.asarray(b1(iq))
    b2 = ReceiverBank(cfg, block_len=n // 4)
    y2 = np.concatenate([np.asarray(b2(iq[i:i + n // 4]))
                         for i in range(0, n, n // 4)], axis=1)
    assert y1.shape == y2.shape
    assert snr_db(y1[:, 10:], y2[:, 10:]) > 60.0


def test_wbfm_audio_decimator_uniform_sampling():
    """Regression (code-review finding): the two-phase 600k->48k decimator
    must produce UNIFORMLY spaced samples (odd outputs at 25j + 12.5, not
    25j + 0.5) -- a 5 kHz tone must fit the uniform 48 kHz grid cleanly."""
    import jax.numpy as jnp_
    from jax import lax
    from tpudsp.chains.wbfm import StereoConfig, WBFMStereoReceiver
    rx = WBFMStereoReceiver()
    h2 = np.asarray(rx._params[1])
    comp_rate = 600000.0
    n = 200000
    f = 5000.0 / comp_rate
    x = np.cos(2 * np.pi * f * np.arange(n)).astype(np.float32)
    A = jnp_.asarray(x)
    o0 = lax.conv_general_dilated(A[None, None], jnp_.asarray(h2[0])[None, None],
                                  (25,), "VALID")[0, 0]
    o1 = lax.conv_general_dilated(A[None, None, 12:], jnp_.asarray(h2[1])[None, None],
                                  (25,), "VALID")[0, 0]
    m = min(o0.shape[0], o1.shape[0])
    y = np.stack([np.asarray(o0[:m]), np.asarray(o1[:m])], 1).reshape(-1)[400:-400]
    k = np.arange(len(y)) + 800
    ref = np.exp(2j * np.pi * f * 12.5 * k)
    a = np.vdot(ref, y + 0j) / np.vdot(ref, ref)
    resid = y - 2 * (a * ref).real
    assert 10 * np.log10(np.mean(y ** 2) / np.mean(resid ** 2)) > 60.0


def test_wbfm_stereo_receiver():
    iq_rate = 2_400_000.0
    n = 1_000_000  # multiple of decim1*25 = 100
    t = np.arange(n)
    comp_rate = 600_000.0
    # build composite at the IQ rate directly (decimation will keep <100k)
    f_p = 19000.0 / iq_rate
    la = np.sin(2 * np.pi * 900.0 / iq_rate * t)
    ra = np.sin(2 * np.pi * 2500.0 / iq_rate * t)
    # composite scale 0.008 ~ broadcast deviation (75 kHz peak at 2.4 Msps
    # with kd=4); hotter scales push FM sidebands past the 270 kHz channel
    # filter and the clipping intermod floors the separation measurement
    comp = ((la + ra) / 2 + 0.1 * np.cos(2 * np.pi * f_p * t)
            + ((la - ra) / 2) * np.cos(2 * np.pi * 2 * f_p * t)) * 0.008
    kd = 4.0
    x = np.exp(1j * 2 * np.pi * kd / 4.0 * np.cumsum(comp) * 4.0).astype(np.complex64)
    rx = WBFMStereoReceiver(block_len=n)
    y = rx(x)
    assert y.ndim == 2 and y.shape[1] == 2
    assert abs(y.shape[0] - n / 50) <= 2
    L, R = y[:, 0], y[:, 1]
    settle = 3 * len(L) // 4
    w = np.hanning(len(L) - settle)
    fl = np.fft.rfftfreq(len(L) - settle, 1 / 48000.0)
    specL = np.abs(np.fft.rfft(L[settle:] * w))
    specR = np.abs(np.fft.rfft(R[settle:] * w))
    i9, i25 = np.argmin(np.abs(fl - 900)), np.argmin(np.abs(fl - 2500))
    b = 3
    pk = lambda s, i: np.max(s[i - b:i + b + 1])
    # separation metric immune to the de-emphasis tilt: each tone must be
    # stronger in its own channel than in the other by >= 30 dB
    # (broadcast grade; cascade pilot smoother + 15 kHz audio lowpass)
    assert 20 * np.log10(pk(specL, i9) / pk(specR, i9)) > 30.0
    assert 20 * np.log10(pk(specR, i25) / pk(specL, i25)) > 30.0


def test_ssb_receiver_chain():
    """SSB chain (chains/ssb.py): a USB voice-band signal at 2 Msps comes
    out as audio; the opposite-sideband receiver rejects it."""
    from tpudsp.chains import SSBConfig, SSBReceiver
    import scipy.signal as sig
    iq_rate = 2_000_000.0
    n = 1_000_000
    t = np.arange(n)
    # message inside the 3 kHz voice band (at the audio rate)
    m = np.sin(2 * np.pi * 800.0 / iq_rate * t) + \
        0.5 * np.sin(2 * np.pi * 1900.0 / iq_rate * t)
    a = sig.hilbert(m)                       # analytic: USB-only spectrum
    iq = (0.3 * a / 2).astype(np.complex64)
    rx = SSBReceiver(SSBConfig(band="usb"), block_len=n)
    audio = np.asarray(rx(iq))
    assert audio.shape == (rx.n_out,)
    tail = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    freqs = np.fft.rfftfreq(len(tail), 1 / 48000.0)
    i800 = np.argmin(np.abs(freqs - 800.0))
    i1900 = np.argmin(np.abs(freqs - 1900.0))
    pk = lambda i: spec[i - 3:i + 4].max()
    noise_floor = np.median(spec[(freqs > 4000) & (freqs < 20000)])
    assert pk(i800) > 30 * noise_floor
    assert pk(i1900) > 10 * noise_floor
    # the LSB receiver rejects the USB signal
    rx2 = SSBReceiver(SSBConfig(band="lsb"), block_len=n)
    audio2 = np.asarray(rx2(iq))
    p_usb = np.mean(tail ** 2)
    p_lsb = np.mean(audio2[len(audio2) // 2:] ** 2)
    assert 10 * np.log10(p_usb / p_lsb) > 30.0


def test_am_receiver_raw_i16_input_matches_converted():
    """input_format='i16' (round-3 perf path: the chain ingests the
    radio's RAW interleaved int16, reference utility.hpp:61-69 semantics,
    at 4 B/sample instead of converting host-side to complex64): output
    must match the c64 chain fed bytes_to_iq-converted samples, streamed
    across blocks (the carried tail stays int16)."""
    from tpudsp.chains.am import AMConfig, AMReceiver

    n = 250_000
    t = np.arange(2 * n)
    msg = np.sin(2 * np.pi * 1000.0 / 2e6 * t)
    iq_f = (1 + 0.5 * msg) * 0.3 * np.exp(2j * np.pi * 200.0 / 2e6 * t)
    i16 = np.stack([np.round(iq_f.real * 32767 * 0.5),
                    np.round(iq_f.imag * 32767 * 0.5)],
                   axis=1).astype(np.int16)
    c64 = ((i16[:, 0] + 1j * i16[:, 1]) / 32767.0).astype(np.complex64)

    rx_c = AMReceiver(AMConfig(), block_len=n)
    rx_i = AMReceiver(AMConfig(), block_len=n, input_format="i16")
    for b in range(2):
        y_c = np.asarray(rx_c(c64[b * n:(b + 1) * n]))
        y_i = np.asarray(rx_i(i16[b * n:(b + 1) * n]))
        assert snr_db(y_c, y_i) > 90.0, b

    with pytest.raises(TypeError, match="int16"):
        rx_i(c64[:n])


def test_am_receiver_raw_u8_input_matches_converted():
    """input_format='u8' (RTL-SDR wire format, 2 B/sample): the affine
    (b-127.5)/127.5 conversion folds into scaled taps + a per-phase DC
    subtraction; output must match the c64 chain on u8_to_iq-converted
    samples, streamed (block 0's first kf samples carry the documented
    half-LSB tail-init transient, so block 1 carries the tight pin)."""
    from tpudsp.chains.am import AMConfig, AMReceiver

    n = 250_000
    t = np.arange(2 * n)
    msg = np.sin(2 * np.pi * 1000.0 / 2e6 * t)
    iq_f = (1 + 0.5 * msg) * 0.3 * np.exp(2j * np.pi * 200.0 / 2e6 * t)
    u8 = np.stack([np.round(iq_f.real * 127.5 * 0.9 + 127.5),
                   np.round(iq_f.imag * 127.5 * 0.9 + 127.5)],
                  axis=1).clip(0, 255).astype(np.uint8)
    c64 = ((u8[:, 0] - 127.5) / 127.5
           + 1j * (u8[:, 1] - 127.5) / 127.5).astype(np.complex64)

    rx_c = AMReceiver(AMConfig(), block_len=n)
    rx_u = AMReceiver(AMConfig(), block_len=n, input_format="u8")
    floors = (50.0, 90.0)
    for b, floor in enumerate(floors):
        y_c = np.asarray(rx_c(c64[b * n:(b + 1) * n]))
        y_u = np.asarray(rx_u(u8[b * n:(b + 1) * n]))
        got = snr_db(y_c, y_u)
        assert got > floor, (b, got)

    with pytest.raises(TypeError, match="uint8"):
        rx_u(c64[:n])


@pytest.mark.parametrize("fmt", ["i16", "u8"])
def test_wbfm_stereo_wire_format_matches_converted(fmt):
    """WBFMStereoReceiver(input_format='i16'/'u8'): raw wire blocks must
    match the complex64 chain fed the dequantized samples to within the
    wire quantization floor (the conversion folds into the channel
    lowpass; u8 offset subtracted pre-conv)."""
    from tpudsp.chains.wbfm import WBFMStereoReceiver
    n = 200_000
    t = np.arange(n)
    iq_rate = 2_400_000.0
    f_p = 19000.0 / iq_rate
    la = np.sin(2 * np.pi * 900.0 / iq_rate * t)
    comp = (la + 0.1 * np.cos(2 * np.pi * f_p * t)) * 0.008
    x = np.exp(1j * 2 * np.pi * np.cumsum(comp) * 4.0).astype(np.complex64)
    if fmt == "i16":
        wire = np.stack([np.round(x.real * 32767), np.round(x.imag * 32767)],
                        axis=1).astype(np.int16)
        xq = (wire[:, 0] + 1j * wire[:, 1]).astype(np.complex64) / 32767.0
    else:
        wire = np.clip(np.round(np.stack([x.real, x.imag], axis=1)
                                * 127.5 + 127.5), 0, 255).astype(np.uint8)
        xq = ((wire[:, 0].astype(np.float32) - 127.5)
              + 1j * (wire[:, 1].astype(np.float32) - 127.5)
              ).astype(np.complex64) / 127.5
    rx_c = WBFMStereoReceiver(block_len=n)
    rx_w = WBFMStereoReceiver(block_len=n, input_format=fmt)
    y_c = np.asarray(rx_c(xq))
    y_w = np.asarray(rx_w(wire))
    assert y_c.shape == y_w.shape
    # drop the start: the wire tail inits at half-LSB (u8 127) vs the c64
    # chain's exact zeros, and the discriminator's angle() of the first
    # near-zero samples amplifies that arbitrarily (transient only)
    s0 = len(y_c) // 10
    err = np.mean((y_c[s0:] - y_w[s0:]) ** 2)
    sig = np.mean(y_c[s0:] ** 2)
    assert 10 * np.log10(sig / (err + 1e-30)) > 80.0
    with pytest.raises(TypeError):
        rx_w(xq)
