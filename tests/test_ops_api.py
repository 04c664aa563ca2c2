"""API-parity tests: the op surface must match the reference's
PYBIND11_MODULE bindings (wrapper.cpp:10-273) -- names, kwargs, defaults,
dtypes -- and the documented behaviors of each class."""

import numpy as np
import pytest

import tpudsp
import tpudsp.compat as liquiddsp
from tests.util import snr_db, tones, noise

ALL_CLASSES = [
    "RResampler", "CResampler", "Delay", "CIIRFilter", "CLowpassIIR",
    "CHighpassIIR", "CBandpassIIR", "CBandstopIIR", "RIIRFilter",
    "RLowpassIIR", "RHighpassIIR", "RBandpassIIR", "RBandstopIIR",
    "ComplexIIRFilter", "RealIIRFilter", "HilbertTransform",
    "DeemphasisFilter", "FreqDem", "AmpModem", "NCO", "RealResampler",
    "ComplexResampler", "AGC", "RealFIRFilter", "RealDCBlocker",
    "RealKaiserBessel", "BroadcastAM", "FMStereo", "SSBDemod",
]


def test_full_surface_present():
    """All 29 classes + bytes_to_iq, importable from both tpudsp and the
    compat module (wrapper.cpp:13-272 inventory, SURVEY.md 2.1)."""
    assert len(ALL_CLASSES) == 29
    for name in ALL_CLASSES:
        assert hasattr(tpudsp, name), name
        assert hasattr(liquiddsp, name), name
    assert callable(tpudsp.bytes_to_iq)


def test_constructor_defaults():
    """Constructors accept exactly the reference's kwarg patterns."""
    liquiddsp.RResampler(rate=0.5)
    liquiddsp.CResampler(rate=2.0)
    liquiddsp.Delay()                       # nd=1 default
    liquiddsp.Delay(nd=5)
    liquiddsp.CIIRFilter(Bc=np.float32([0.5, 0.5]), Ac=np.float32([1.0]))
    liquiddsp.CLowpassIIR(order=4, Fc=0.1)  # filter_type/Ap/As defaulted
    liquiddsp.CHighpassIIR(filter_type="cheby1", order=3, Fc=0.2, Ap=0.4)
    liquiddsp.CBandpassIIR(order=2, Fc=0.02, F0=0.2)
    liquiddsp.CBandstopIIR(order=2, Fc=0.02, F0=0.2, As=40.0)
    liquiddsp.RLowpassIIR(order=4, Fc=0.1)
    liquiddsp.RHighpassIIR(order=4, Fc=0.1)
    liquiddsp.RBandpassIIR(order=2, Fc=0.02, F0=0.2)
    liquiddsp.RBandstopIIR(order=2, Fc=0.02, F0=0.2)
    liquiddsp.ComplexIIRFilter()            # all kwargs defaulted
    liquiddsp.RealIIRFilter(filter_type="ellip", band_type="highpass",
                            order=3, Fc=0.1, Ap=0.5, As=50.0)
    liquiddsp.HilbertTransform()            # m=5, As=60
    liquiddsp.DeemphasisFilter()            # sample_rate=48000
    liquiddsp.FreqDem(4.0)                  # positional kd
    liquiddsp.AmpModem()                    # modulation=0.75, dsb, carrier=False
    liquiddsp.NCO()                         # type='nco'
    liquiddsp.NCO(type="vco")
    liquiddsp.RealResampler(rate=0.5, Fc=0.2)  # len=20, As=60, nfilter=13
    liquiddsp.ComplexResampler(rate=0.5, len=12, Fc=0.2, As=50.0, nfilter=32)
    liquiddsp.AGC()
    liquiddsp.RealFIRFilter(np.float32([0.25, 0.5, 0.25]))
    liquiddsp.RealDCBlocker()               # slen=25, As=20
    liquiddsp.RealKaiserBessel(Fc=0.1)      # flen=25, As=20, offset=0
    liquiddsp.BroadcastAM()                 # slen=25
    liquiddsp.FMStereo()                    # 600000, 48000
    liquiddsp.SSBDemod("usb")


def test_readme_am_radio_chain_constructs():
    """The reference README's AMRadio chain (README.md:41-58) must work
    verbatim against this framework."""
    bandwidth, iq_rate, pcm_rate = 15000, 2000000, 48000
    bandpass = liquiddsp.ComplexIIRFilter(filter_type="cheby2", order=8,
                                          Fc=bandwidth / iq_rate)
    resample = liquiddsp.ComplexResampler(rate=pcm_rate / iq_rate,
                                          Fc=pcm_rate / iq_rate)
    am = liquiddsp.AmpModem(modulation=0.5, type="dsb", carrier=True)
    audio_filter = liquiddsp.DeemphasisFilter(pcm_rate)
    agc = liquiddsp.AGC()
    agc.lock = False
    agc.scale = 0.01
    iq = noise(20000, complex_out=True, seed=0).astype(np.complex64)
    pcm = audio_filter(am(agc(resample(bandpass(iq)))))
    assert pcm.dtype == np.float32
    assert len(pcm) == int(20000 * pcm_rate / iq_rate) or abs(
        len(pcm) - 20000 * pcm_rate / iq_rate) <= 1


def test_dtype_contract():
    """IQ = complex64 in, PCM = float32 out (SURVEY.md 2.1 dtype table);
    wrong dtypes raise typed errors (Q7 fix)."""
    f = tpudsp.ComplexIIRFilter(order=2, Fc=0.1)
    y = f(np.zeros(64, np.complex64))
    assert y.dtype == np.complex64
    with pytest.raises(TypeError):
        f(np.zeros(64, np.float32))
    d = tpudsp.Delay(nd=3)
    with pytest.raises(TypeError):
        d(np.zeros(8, np.int32))
    with pytest.raises(TypeError):
        tpudsp.HilbertTransform()(np.zeros(8, np.float64))


def test_delay_dtype_dispatch():
    d = tpudsp.Delay(nd=4)
    xc = np.arange(8, dtype=np.complex64)
    xr = np.arange(8, dtype=np.float32)
    yc = d(xc)
    yr = d(xr)
    np.testing.assert_allclose(yc[4:], xc[:4])
    np.testing.assert_allclose(yc[:4], 0)
    np.testing.assert_allclose(yr[4:], xr[:4])
    d.delay = 2  # structural change resets state (Q5)
    assert d.delay == 2
    y2 = d(xr)
    np.testing.assert_allclose(y2[:2], 0)


def test_nco_properties_and_mixing():
    nco = tpudsp.NCO()
    nco.freq = 0.3
    assert abs(nco.freq - 0.3) < 1e-9
    nco.phase = 1.0
    assert abs(nco.phase - 1.0) < 1e-6
    nco.adjust_phase(0.5)
    assert abs(nco.phase - 1.5) < 1e-6
    nco.adjust_frequency(-0.1)
    assert abs(nco.freq - 0.2) < 1e-9
    x = np.ones(1000, np.complex64)
    y = nco(x)  # __call__ = mix_up
    ref = np.exp(1j * (1.5 + 0.2 * np.arange(1000)))
    assert snr_db(ref, y) > 60.0
    # phase advanced by N*freq
    assert abs((nco.phase - (1.5 + 0.2 * 1000)) % (2 * np.pi)) < 1e-3 or \
           abs(((1.5 + 0.2 * 1000) - nco.phase) % (2 * np.pi)) < 1e-3
    nco.set_pll_bandwidth(0.01)
    nco.pll_step(0.1)  # must not throw; adjusts freq and phase


def test_agc_properties():
    agc = tpudsp.AGC()
    agc.bandwidth = 0.05
    assert agc.bandwidth == 0.05
    agc.gain = 2.0
    assert abs(agc.gain - 2.0) < 1e-6
    agc.level = 0.5
    assert abs(agc.level - 0.5) < 1e-6
    agc.level_dB = -20.0
    assert abs(agc.level_dB + 20.0) < 1e-4
    agc.scale = 0.01
    assert agc.scale == 0.01
    assert agc.status == 7  # DISABLED when squelch off (agc_docs numbering)
    agc.squelch = True
    assert agc.status == 1  # ENABLED
    x = 0.3 * tones(2000, [0.01]).astype(np.complex64)
    agc.squelch = False
    y = agc(x)
    # converged AGC normalizes level to ~scale
    assert abs(np.abs(y[-200:]).mean() - agc.scale) / agc.scale < 0.2
    agc.lock = True
    g = agc.gain
    agc(x)
    assert agc.gain == g  # locked: no gain update
    agc.reset()
    assert agc.lock is False and agc.squelch is False


def test_agc_squelch_zeroing_and_onrise():
    agc = tpudsp.AGC()
    agc.squelch = True
    agc.threshold = 10.0
    rises = []
    agc.onRise = lambda: rises.append(1)
    n = 4000
    amp = np.where((np.arange(n) > 1500) & (np.arange(n) < 3000), 1.0, 1e-4)
    x = (tones(n, [0.02]) * amp).astype(np.complex64)
    y = agc(x)
    assert len(rises) >= 1           # squelch opened once
    assert np.all(y[:100] == 0)      # below threshold: zeroed
    assert np.abs(y[2500:2900]).mean() > 0  # open: passing signal


def test_amp_modem_properties_rebuild():
    am = tpudsp.AmpModem()
    assert am.modulation == 0.75 and am.type == "dsb" and am.carrier is False
    am.type = "usb"
    assert am.type == "usb"
    am.type = "bogus"  # reference ignores unknown types (demod.hpp:254-259)
    assert am.type == "usb"
    am.modulation = 0.5
    am.carrier = True
    assert am.carrier is True


def test_resampler_rate_property_and_reset():
    rs = tpudsp.RealResampler(rate=0.5, Fc=0.2)
    assert rs.rate == 0.5
    x = noise(1000, complex_out=False, seed=3).astype(np.float32)
    y1 = rs(x)
    assert abs(len(y1) - 500) <= 1
    rs.rate = 0.25  # keeps state (Q5)
    y2 = rs(x)
    assert abs(len(y2) - 250) <= 1
    rs.reset()
    out = rs(np.zeros(100, np.float32))
    assert np.allclose(out, 0)


def test_resampler_output_length_long_run_exact():
    """Q8: per-call lengths vary but the long-run rate is exact."""
    rate = 48000.0 / 2000000.0
    rs = tpudsp.ComplexResampler(rate=rate, Fc=rate)
    total_in, total_out = 0, 0
    x = noise(7777, complex_out=True, seed=4).astype(np.complex64)
    for _ in range(20):
        total_in += len(x)
        total_out += len(rs(x))
    assert abs(total_out - total_in * rate) <= 1


def test_freqresponse_methods():
    f = tpudsp.ComplexIIRFilter(filter_type="butter", order=4, Fc=0.1)
    h0 = f.freqresponse(0.0)
    assert abs(abs(h0) - 1.0) < 1e-3       # lowpass: unity DC gain
    h_stop = f.freqresponse(0.4)
    assert abs(h_stop) < 0.05
    kb = tpudsp.RealKaiserBessel(flen=51, Fc=0.1, As=60.0)
    assert abs(abs(kb.freqresponse(0.0)) - 1.0) < 1e-6  # self-normalized
    dc = tpudsp.RealDCBlocker(slen=64, As=40.0)
    assert abs(dc.freqresponse(0.0)) < 1e-3             # DC notched
    assert abs(abs(dc.freqresponse(0.25)) - 1.0) < 0.1  # passband ~1
    dm = tpudsp.DeemphasisFilter(48000)
    assert abs(abs(dm.freqresponse(0.0)) - 1.0) < 1e-3


def test_bytes_to_iq():
    raw = np.array([32767, 0, 0, -32767, 16384, 16384], dtype=np.int16).tobytes()
    iq = tpudsp.bytes_to_iq(raw)
    assert iq.dtype == np.complex64
    np.testing.assert_allclose(iq, [1.0, -1.0j, 0.5 + 0.5j], atol=1e-4)
    # trailing partial pair dropped
    assert len(tpudsp.bytes_to_iq(raw + b"\x01")) == 3


def test_hilbert_transform_rates():
    ht = tpudsp.HilbertTransform(m=5, As=60.0)
    xc = np.exp(2j * np.pi * 0.05 * np.arange(256)).astype(np.complex64)
    y = ht(xc)
    assert y.dtype == np.float32 and len(y) == 512  # intended 2x rate (Q1 fix)
    xr = np.cos(2 * np.pi * 0.1 * np.arange(256)).astype(np.float32)
    z = ht(xr)
    assert z.dtype == np.complex64 and len(z) == 128  # half rate


def test_state_checkpoint_resume():
    """Capability upgrade (SURVEY.md section 5): state pytrees are
    checkpointable; resuming reproduces the stream exactly."""
    f = tpudsp.ComplexIIRFilter(filter_type="cheby2", order=8, Fc=0.0075)
    x = noise(3000, complex_out=True, seed=5).astype(np.complex64)
    f(x[:1000])
    snapshot = f.state
    y_cont = f(x[1000:])
    f2 = tpudsp.ComplexIIRFilter(filter_type="cheby2", order=8, Fc=0.0075)
    f2.with_state(snapshot)
    y_resume = f2(x[1000:])
    np.testing.assert_array_equal(y_cont, y_resume)


def test_print_methods(capsys):
    """print() surface parity (liquid *_print equivalents)."""
    for obj in (tpudsp.ComplexIIRFilter(), tpudsp.RealResampler(rate=0.5, Fc=0.2),
                tpudsp.NCO(), tpudsp.AGC(), tpudsp.FreqDem(4.0), tpudsp.AmpModem()):
        obj.print()
    assert len(capsys.readouterr().out.splitlines()) >= 6
