"""Sample-serial oracles for the composite demodulators (executable spec).

These pin the three parity claims that previously rested on assertion
(round-1 VERDICT.md "What's missing" #1):

- ``FMStereoOracle``: the reference FMStereo topology *exactly as written*
  (reference demod.hpp:39-84): per sample freqdem -> mix down by theta
  (19 kHz NCO) -> one-pole phase-error filter (demod.hpp:64) -> mix down by
  theta again (38 kHz total) -> pll_step/step -> per-channel 75 us
  de-emphasis at iq_rate -> per-channel resample to pcm_rate.
  phase_error initialized to 0 per the SURVEY.md Q3 disposition (the
  reference reads it uninitialized, demod.hpp:13). The pilot NCO's PLL
  bandwidth is liquid's default 0.1 unless overridden -- the reference
  never sets it (demod.hpp:26).
  tests/test_oracle_composite.py uses this oracle to *demonstrate* the
  divergence that motivated the pilot-squaring re-architecture in
  tpudsp/kernels/pll.py, and to pin the mono signal path (freqdem ->
  deemphasis-at-iq-rate -> resample ordering) against the block-parallel
  implementation.

- ``BroadcastAMOracle``: the reference BroadcastAM topology
  (demod.hpp:133-152): per sample kaiser-lowpass FIR push/execute, delay
  push/read, both paths mixed down by the NCO phase, pll_step(arg(v0)),
  step, cheby2 highpass DC block on Re(v1). Same topology as
  tpudsp/ops/demod.py BroadcastAM -- agreement is a genuine sample-serial
  vs block-parallel pin.

- ``AmpModemOracle``: sample-serial statement of this framework's
  documented ampmodem semantics (tpudsp/kernels/ampmodem.py: PLL carrier
  recovery bw 0.001, one-pole DC tracker rho=0.9995, Hilbert sideband
  split), covering both carrier modes and all three sideband types.

Like tests/oracle/liquid_oracle.py, these loops intentionally share no
formulation with tpudsp/kernels (per-sample recurrences in float64 here;
scans / overlap-save / associative scans there).
"""

from __future__ import annotations

import numpy as np

from .liquid_oracle import (
    DelayOracle,
    FirFilterOracle,
    FirstOrderOracle,
    NcoOracle,
    ResampOracle,
    SosFilterOracle,
)

TWO_PI = 2.0 * np.pi


class FMStereoOracle:
    """Reference demod.hpp:39-84, sample-serial. Returns flat interleaved
    L,R exactly as the reference emits (the tpudsp FMStereo op emits (N,2)
    per the SURVEY.md Q3 disposition)."""

    def __init__(self, iq_rate=600000.0, pcm_rate=48000.0, pll_bw=0.1,
                 warm_start=False):
        from tpudsp.design import firdes, iirdes

        self.iq_rate = float(iq_rate)
        rate = float(pcm_rate) / float(iq_rate)
        b0, a = iirdes.deemphasis_coeffs(self.iq_rate)
        # FirstOrderOracle convention: y[n] = b0 x[n] + a y[n-1]
        self.emph_l = FirstOrderOracle(b0, a)
        self.emph_r = FirstOrderOracle(b0, a)
        m, fc, As, npfb = firdes.default_resamp_params(rate)
        H = firdes.resamp_bank(m, fc, As, npfb)
        self.rs_l = ResampOracle(H, rate)
        self.rs_r = ResampOracle(H, rate)
        self.nco = NcoOracle()
        self.nco.set_pll_bandwidth(pll_bw)
        if warm_start:
            self.nco.set_frequency(TWO_PI * 19000.0 / self.iq_rate)
        self.phase_error = 0.0  # SURVEY.md Q3: init 0 (reference reads UB)
        self.kd = 4.0           # freqdem_create(4.0), demod.hpp:27
        self.prev = 1.0 + 0.0j
        self.freq_trace = []

    def __call__(self, x):
        out = []
        for xn in np.asarray(x):
            s = np.angle(np.conj(self.prev) * xn) / (TWO_PI * self.kd)
            self.prev = xn
            th = self.nco.phase
            sc = s * np.exp(-1j * th)                  # down 19 kHz
            self.phase_error = 0.999 * self.phase_error + 0.001 * np.angle(sc)
            sc = sc * np.exp(-1j * th)                 # down 38 kHz total
            self.nco.pll_step(self.phase_error)
            self.nco.step()
            self.freq_trace.append(self.nco.freq_f)
            left = self.emph_l(np.array([s + sc.real]))[0]
            right = self.emph_r(np.array([s - sc.real]))[0]
            yl = self.rs_l(np.array([left]))
            yr = self.rs_r(np.array([right]))
            # reference emits a pair only when both resamplers emit
            # (demod.hpp:44-46)
            if len(yl) and len(yr):
                out.append((yl[0], yr[0]))
        return np.array(out, dtype=np.float64).reshape(-1)


class BroadcastAMOracle:
    """Reference demod.hpp:133-152, sample-serial."""

    def __init__(self, slen=25):
        from tpudsp.design import firdes, iirdes

        m = int(slen)
        self.m = m
        h = firdes.kaiser_lowpass(2 * m + 1, 0.01, 40.0)
        self.lowpass = FirFilterOracle(h, complex_data=True)
        self.delay = DelayOracle(m, complex_data=True)
        self.nco = NcoOracle()
        self.nco.set_pll_bandwidth(0.001)  # demod.hpp:104
        sos = iirdes.iirdes_sos("cheby2", "highpass", 3, 20.0 / 48000.0,
                                Ap=0.5, As=20.0)
        self.dcblock = SosFilterOracle(sos)

    def __call__(self, x):
        out = np.empty(len(x))
        for n, xn in enumerate(np.asarray(x)):
            x0 = self.lowpass(np.array([xn]))[0]
            x1 = self.delay(np.array([xn]))[0]
            th = self.nco.phase
            v0 = x0 * np.exp(-1j * th)
            v1 = x1 * np.exp(-1j * th)
            self.nco.pll_step(np.angle(v0))
            self.nco.step()
            out[n] = self.dcblock(np.array([v1.real])).real[0]
        return out


class AmpModemOracle:
    """Sample-serial statement of tpudsp/kernels/ampmodem.py semantics
    (PLL bw 0.001, DC one-pole rho 0.9995, Hilbert split with semi-length
    HILB_M), both carrier modes, dsb/usb/lsb."""

    def __init__(self, modulation=0.75, am_type="dsb", carrier=False):
        from tpudsp.design import firdes
        from tpudsp.kernels.ampmodem import DC_RHO, HILB_M, PLL_BW

        self.mod = float(modulation)
        self.am_type = am_type
        self.carrier = bool(carrier)
        self.rho = DC_RHO
        self.dc = 0.0
        self.nco = NcoOracle()
        self.nco.set_pll_bandwidth(PLL_BW)
        h = firdes.hilbert_fir(HILB_M, 60.0)
        self.hilb = FirFilterOracle(h)
        self.idelay = DelayOracle(2 * HILB_M)

    def __call__(self, x):
        out = np.empty(len(x))
        for n, xn in enumerate(np.asarray(x)):
            if self.carrier:
                th = self.nco.phase
                v = xn * np.exp(-1j * th)
                self.nco.pll_step(np.angle(v))
                self.nco.step()
            else:
                v = xn
            if self.am_type == "dsb":
                m_raw = v.real
            else:
                hq = self.hilb(np.array([v.imag]))[0]
                i_d = self.idelay(np.array([v.real])).real[0]
                m_raw = i_d - hq if self.am_type == "usb" else i_d + hq
            if self.carrier:
                self.dc = (1.0 - self.rho) * m_raw + self.rho * self.dc
                out[n] = (m_raw - self.dc) / self.mod
            else:
                out[n] = m_raw / self.mod
        return out
