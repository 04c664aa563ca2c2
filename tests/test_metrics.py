"""Per-block metrics plumbing (SURVEY.md section 5 observability; round-1
VERDICT "do this" #6): the chains return a BlockMetrics pytree alongside
audio -- rssi, squelch-mode tensor, recovered PLL frequency, resampler
credit -- with physically meaningful values."""

import numpy as np

import tpudsp
from tpudsp.chains import (AMConfig, AMReceiver, BankConfig, BlockMetrics,
                           ChannelizedBank, ChannelizedBankConfig,
                           ChannelizerConfig, ReceiverBank)
from tpudsp.kernels import agc as kagc


def test_am_receiver_metrics():
    fs = 2_000_000.0
    n = 1_000_000
    t = np.arange(n)
    amp, f_carrier = 0.3, 300.0
    m = np.sin(2 * np.pi * 1000.0 / fs * t)
    iq = ((1 + 0.5 * m) * amp
          * np.exp(2j * np.pi * f_carrier / fs * t)).astype(np.complex64)
    rx = AMReceiver(AMConfig(), block_len=n)
    assert rx.metrics is None
    rx(iq)
    met = rx.metrics
    assert isinstance(met, BlockMetrics)
    # rssi converges to the input level: -20 log10 g = 20 log10 amp
    assert abs(float(met.rssi) - 20 * np.log10(amp)) < 1.5
    # the carrier PLL frequency is the actual carrier offset at 48 kHz
    w_expect = 2 * np.pi * f_carrier / 48_000.0
    assert abs(float(met.pll_freq) - w_expect) < 0.1 * w_expect
    # squelch disabled: the whole mode tensor sits in DISABLED
    modes = np.asarray(met.squelch_modes)
    assert modes.shape == (int(n * AMConfig().rate),)
    assert (modes == kagc.SQ_DISABLED).all()
    assert float(met.resamp_credit) == 0.0


def test_receiver_bank_coherent_metrics():
    fs = 2_400_000.0
    n = 500_000
    t = np.arange(n)
    freqs = (200_000.0, -400_000.0)
    amps = (0.5, 0.05)  # 20 dB apart
    m = np.sin(2 * np.pi * 2000.0 / fs * t)
    iq = sum(a * (1 + 0.5 * m) * np.exp(2j * np.pi * f / fs * t)
             for f, a in zip(freqs, amps)).astype(np.complex64)
    cfg = BankConfig(freqs=freqs, iq_rate=fs, demod="am", am_coherent=True)
    bank = ReceiverBank(cfg, block_len=n)
    bank(iq)
    met = bank.metrics
    rssi = np.asarray(met.rssi)
    assert rssi.shape == (2,)
    # per-channel levels ~20 dB apart (channel filter gain is common mode)
    assert 15.0 < (rssi[0] - rssi[1]) < 25.0
    assert np.asarray(met.pll_freq).shape == (2,)
    modes = np.asarray(met.squelch_modes)
    assert modes.shape == (2, n // cfg.decim1)
    assert (modes == kagc.SQ_DISABLED).all()


def test_receiver_bank_fm_metrics_none():
    cfg = BankConfig(freqs=(0.0,), iq_rate=2_400_000.0, demod="fm")
    bank = ReceiverBank(cfg, block_len=100_000)
    bank(np.zeros(100_000, np.complex64))
    met = bank.metrics
    assert met.rssi is None and met.squelch_modes is None
    assert met.pll_freq is None


def test_channelized_bank_coherent_metrics():
    C = 64
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, iq_rate=6_400_000.0,
                                      taps_per_branch=8),
        demod="am", am_coherent=True)
    n = C * 512
    rng = np.random.default_rng(0)
    iq = (0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    bank = ChannelizedBank(cfg, block_len=n)
    bank(iq)
    met = bank.metrics
    assert np.asarray(met.rssi).shape == (C,)
    assert np.asarray(met.pll_freq).shape == (C,)
    assert np.asarray(met.squelch_modes).shape == (C, n // C)


def test_wbfm_stereo_metrics_pilot_lock():
    """WBFM stereo (round-2 VERDICT weak #2): the chain returns pilot
    telemetry -- pilot_level reflects the 19 kHz pilot amplitude and
    pll_freq its offset from nominal -- and the output stays on device."""
    import jax
    from tpudsp.chains.wbfm import WBFMStereoReceiver

    iq_rate = 2_400_000.0
    n = 1_000_000
    t = np.arange(n)
    f_off = 3.0  # pilot 3 Hz off nominal
    f_p = (19000.0 + f_off) / iq_rate
    la = np.sin(2 * np.pi * 900.0 / iq_rate * t)
    comp = (la / 2 + 0.1 * np.cos(2 * np.pi * f_p * t)) * 0.008
    x = np.exp(1j * 2 * np.pi * np.cumsum(comp)).astype(np.complex64)
    rx = WBFMStereoReceiver(block_len=n)
    assert rx.metrics is None
    y = rx(x)
    # device-native output: no silent host materialization per block
    assert isinstance(y, jax.Array)
    assert y.shape[1] == 2
    met = rx.metrics
    lvl = float(met.pilot_level)
    assert lvl > 0.0
    # pilot offset estimate: 3 Hz at the 600 kHz composite rate
    comp_rate = iq_rate / 4
    w_expect = 2 * np.pi * f_off / comp_rate
    assert abs(float(met.pll_freq) - w_expect) < 0.5 * w_expect + 1e-6, (
        float(met.pll_freq), w_expect)
    # no pilot -> pilot_level collapses far below the locked level
    rx2 = WBFMStereoReceiver(block_len=n)
    x2 = np.exp(1j * 2 * np.pi * np.cumsum(
        (la / 2) * 0.008)).astype(np.complex64)
    rx2(x2)
    assert float(rx2.metrics.pilot_level) < 0.1 * lvl


def test_ssb_receiver_metrics():
    from tpudsp.chains import SSBConfig, SSBReceiver

    n = 500_000
    t = np.arange(n)
    amp = 0.25
    iq = (amp * np.exp(2j * np.pi * 800.0 / 2e6 * t)).astype(np.complex64)
    rx = SSBReceiver(SSBConfig(band="usb"), block_len=n)
    assert rx.metrics is None
    rx(iq)
    met = rx.metrics
    assert isinstance(met, BlockMetrics)
    assert np.isfinite(float(met.rssi))
    # rssi tracks the post-front-end level (the 800 Hz tone passes the
    # channel filter essentially unattenuated): -20 log10 g ~ 20 log10 amp
    assert abs(float(met.rssi) - 20 * np.log10(amp)) < 3.0
    modes = np.asarray(met.squelch_modes)
    assert modes.shape == (rx.n_out,)
    assert (modes == kagc.SQ_DISABLED).all()
