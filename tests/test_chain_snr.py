"""Headline fidelity: the fused, throughput-mode AM chain vs the float64
sample-serial oracle chain (BASELINE.md acceptance: >= 60 dB SNR vs the
reference's semantics)."""

import numpy as np

from tpudsp.chains import AMConfig, AMReceiver
from tpudsp.design import firdes, iirdes
from tests.oracle.liquid_oracle import AgcOracle, FirstOrderOracle, ResampOracle, SosFilterOracle
from tests.util import snr_db


def oracle_am_chain(iq, cfg: AMConfig):
    """Reference-ordered chain in float64 sample-serial oracles:
    bandpass -> resample -> AGC -> coherent AM (ideal, float64 PLL-free
    derotation is NOT possible -- instead mirror the framework's documented
    AmpModem semantics with a float64 PLL loop) -> de-emphasis."""
    sos = iirdes.iirdes_sos("cheby2", "lowpass", cfg.order,
                            cfg.bandwidth / cfg.iq_rate, As=60.0, Ap=0.5)
    bp = SosFilterOracle(sos)
    H = firdes.resamp_bank(cfg.resamp_m, 0.45 * cfg.rate, 60.0, cfg.resamp_npfb)
    rs = ResampOracle(H, cfg.rate, complex_data=True)
    agc = AgcOracle(bandwidth=cfg.agc_bandwidth)
    agc.scale = cfg.agc_scale
    agc.sq_mode = 7  # squelch disabled
    x = rs(bp(iq))
    y, _ = agc(x)

    # AmpModem dsb+carrier: PLL (bw 0.001, liquid nco gains) + DC one-pole
    theta, freq = 0.0, 0.0
    alpha, beta = 0.001, np.sqrt(0.001)
    dc = 0.0
    rho = 0.9995
    out = np.empty(len(y))
    for n in range(len(y)):
        v = y[n] * np.exp(-1j * theta)
        err = np.angle(v) if abs(v) > 0 else 0.0
        freq += alpha * err
        theta = theta + beta * err + freq
        theta = (theta + np.pi) % (2 * np.pi) - np.pi
        m_raw = v.real
        dc = rho * dc + (1 - rho) * m_raw
        out[n] = (m_raw - dc) / cfg.modulation

    de = FirstOrderOracle(*iirdes.deemphasis_coeffs(cfg.pcm_rate))
    return de(out)


def test_am_chain_snr_vs_oracle():
    cfg = AMConfig()
    n = 500_000
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1000.0 / cfg.iq_rate * t)
    iq = ((1.0 + 0.5 * msg) * 0.3
          * np.exp(2j * np.pi * 200.0 / cfg.iq_rate * t)).astype(np.complex64)

    y_oracle = oracle_am_chain(iq.astype(np.complex128), cfg)

    rx = AMReceiver(cfg, block_len=n // 2, plan="fused", exact=False)
    y = np.concatenate([np.asarray(rx(iq[:n // 2])), np.asarray(rx(iq[n // 2:]))])

    assert y.shape == y_oracle.shape
    # settled region (PLL locked, AGC converged, DC tracker settled)
    settle = len(y) // 2
    s = snr_db(y_oracle[settle:], y[settle:])
    # bar raised 60 -> 100 dB (round-5 VERDICT #4) once the whole chain
    # family routes the rho=0.9995 DC tracker through the compensated
    # double-float scan; measured 122 dB on this signal (2026-08-21)
    assert s > 100.0, f"chain SNR vs oracle {s:.1f} dB"
