"""Streaming block-invariance for the composite demodulators: the same
stream split into different block sizes must produce the same output
(carried-state correctness for FMStereo / BroadcastAM / AmpModem), plus
the usb+carrier AmpModem path."""

import numpy as np
import pytest

import tpudsp
from tpudsp.kernels import ampmodem as kam
from tests.util import snr_db


def test_fmstereo_block_invariance():
    n = 120000
    t = np.arange(n)
    iq_rate = 600000.0
    f_p = 19000.0 / iq_rate
    la = np.sin(2 * np.pi * 900.0 / iq_rate * t)
    comp = (la + 0.1 * np.cos(2 * np.pi * f_p * t)) * 0.04
    x = np.exp(1j * 2 * np.pi * 4.0 * np.cumsum(comp)).astype(np.complex64)
    s1 = tpudsp.FMStereo()
    y1 = s1(x)
    s2 = tpudsp.FMStereo()
    y2 = np.concatenate([s2(x[:50000]), s2(x[50000:])])
    assert y1.shape == y2.shape
    assert snr_db(y1[200:], y2[200:]) > 70.0


def test_broadcastam_block_invariance():
    n = 60000
    t = np.arange(n)
    m = np.sin(2 * np.pi * 2000.0 / 48000.0 * t)
    x = ((1 + 0.5 * m) * np.exp(2j * np.pi * 0.001 * t)).astype(np.complex64)
    d1 = tpudsp.BroadcastAM()
    y1 = d1(x)
    d2 = tpudsp.BroadcastAM()
    y2 = np.concatenate([d2(x[:17000]), d2(x[17000:])])
    # the carrier PLL is a feedback loop: split-boundary f32 rounding
    # perturbs the phase trajectory slightly; ~59 dB agreement measured
    assert snr_db(y1[100:], y2[100:]) > 50.0


def test_ampmodem_carrier_block_invariance():
    n = 50000
    m = np.sin(2 * np.pi * 0.02 * np.arange(n))
    x = kam.modulate(m, 0.5, "dsb", carrier=True, carrier_freq=0.001
                     ).astype(np.complex64)
    a1 = tpudsp.AmpModem(modulation=0.5, carrier=True)
    y1 = a1(x)
    a2 = tpudsp.AmpModem(modulation=0.5, carrier=True)
    y2 = np.concatenate([a2(x[:12345]), a2(x[12345:])])
    assert snr_db(y1[1000:], y2[1000:]) > 60.0


@pytest.mark.parametrize("am_type", ["usb", "lsb"])
def test_ampmodem_sideband_with_carrier_roundtrip(am_type):
    """SSB with pilot carrier: PLL locks on the carrier, the Hilbert split
    then recovers the message from the chosen sideband."""
    n = 80000
    m = np.sin(2 * np.pi * 0.02 * np.arange(n))
    x = kam.modulate(m, 0.8, am_type, carrier=True, carrier_freq=0.0005
                     ).astype(np.complex64)
    am = tpudsp.AmpModem(modulation=0.8, type=am_type, carrier=True)
    y = am(x)
    # Hilbert sideband-split group delay ~2m; the wideband PLL tracking a
    # carrier next to strong sideband content phase-wobbles at the audio
    # rate (measured ~27 dB at best delay fit) -- inherent to the topology
    # (clean SSB uses SSBDemod or carrier=False); fit delay and amplitude.
    best = -np.inf
    for d in range(2 * kam.HILB_M - 5, 2 * kam.HILB_M + 5):
        tm = m[60000 - d:len(m) - d][: len(y) - 60000]
        ty = y[60000:]
        a = np.dot(tm, ty) / np.dot(tm, tm)
        best = max(best, snr_db(a * tm, ty))
        if best == snr_db(a * tm, ty):
            a_best = a
    assert 0.5 < a_best < 1.5, a_best
    assert best > 20.0, best
