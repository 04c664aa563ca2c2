"""Pallas kernel equivalence tests (interpret mode on the CPU backend;
the same kernels compile natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from tpudsp.kernels import agc as kagc
from tpudsp.pallas.agc_scan import agc_chunked_pallas
from tests.util import snr_db, tones


def test_agc_pallas_matches_xla_chunked():
    n = 20000
    x = tones(n, [0.01], complex_out=True)
    amp = np.where(np.arange(n) < n // 2, 0.05, 0.5)
    x = (x * amp).astype(np.complex64)
    params = kagc.make_params(alpha=0.01)
    st = kagc.agc_init()
    st_x, (y_xla, m_xla) = kagc.agc_apply_chunked(params, st, jnp.asarray(x),
                                                  chunk=1024, warmup=2048)
    st_p, (y_pal, m_pal) = agc_chunked_pallas(params, st, jnp.asarray(x),
                                              chunk=1024, warmup=2048,
                                              interpret=True)
    assert y_pal.shape == y_xla.shape
    assert snr_db(np.asarray(y_xla), np.asarray(y_pal)) > 80.0
    np.testing.assert_allclose(float(st_p.g), float(st_x.g), rtol=1e-4)


def test_agc_pallas_squelch_modes():
    n = 8000
    amp = np.where((np.arange(n) > 3000) & (np.arange(n) < 6000), 1.0, 1e-4)
    x = (np.exp(2j * np.pi * 0.02 * np.arange(n)) * amp).astype(np.complex64)
    params = kagc.make_params(alpha=0.05, squelch=True, threshold=20.0)
    st = kagc.agc_init(squelch=True)
    _, (y_xla, m_xla) = kagc.agc_apply_chunked(params, st, jnp.asarray(x),
                                               chunk=1024, warmup=2048)
    _, (y_pal, m_pal) = agc_chunked_pallas(params, st, jnp.asarray(x),
                                           chunk=1024, warmup=2048,
                                           interpret=True)
    assert np.mean(np.asarray(m_pal) == np.asarray(m_xla)) > 0.995
    # zeroing behavior identical where modes agree
    agree = np.asarray(m_pal) == np.asarray(m_xla)
    np.testing.assert_allclose(np.asarray(y_pal)[agree],
                               np.asarray(y_xla)[agree], atol=1e-4)
