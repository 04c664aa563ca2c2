"""Checkpoint/resume (SURVEY.md section 5): save a chain mid-stream, restore
into a fresh instance, outputs must continue bit-exactly."""

import os

import numpy as np

import tpudsp
from tpudsp.chains import AMConfig, AMReceiver
from tpudsp.io.checkpoint import load_state, save_state
from tpudsp.utils import stage_report
from tests.util import noise


def test_op_state_roundtrip(tmp_path):
    f = tpudsp.ComplexIIRFilter(filter_type="cheby2", order=8, Fc=0.0075)
    x = noise(3000, complex_out=True, seed=1).astype(np.complex64)
    f(x)
    p = os.path.join(tmp_path, "iir.npz")
    save_state(p, f.state)
    y_cont = f(x)
    g = tpudsp.ComplexIIRFilter(filter_type="cheby2", order=8, Fc=0.0075)
    g.with_state(load_state(p, g.state))
    np.testing.assert_array_equal(y_cont, g(x))


def test_chain_state_roundtrip(tmp_path):
    n = 250_000
    t = np.arange(n)
    iq = ((1 + 0.5 * np.sin(2 * np.pi * 1e-3 * t)) * 0.3).astype(np.complex64)
    rx = AMReceiver(AMConfig(), block_len=n, plan="fused", exact=True)
    rx(iq)
    p = os.path.join(tmp_path, "chain.npz")
    save_state(p, rx.state)
    y_cont = np.asarray(rx(iq))
    rx2 = AMReceiver(AMConfig(), block_len=n, plan="fused", exact=True)
    rx2.state = load_state(p, rx2.state)
    np.testing.assert_array_equal(y_cont, np.asarray(rx2(iq)))


def test_stage_report(capsys):
    import io
    buf = io.StringIO()
    rec = stage_report("agc", out=np.ones(64, np.complex64),
                       modes=np.array([7] * 60 + [2] * 4),
                       extra={"gain": 1.5}, file=buf)
    assert rec["out_rms"] == 1.0
    assert rec["squelch_modes"] == {7: 60, 2: 4}
    assert "agc" in buf.getvalue()


def test_load_state_rejects_mismatched_snapshot(tmp_path):
    """Round-1 VERDICT weak #7: a stale/mismatched snapshot must raise,
    not silently mis-assign compatible-shaped leaves."""
    import pytest
    from tpudsp.kernels import agc as kagc
    from tpudsp.kernels import pll as kpll
    p = os.path.join(tmp_path, "st.npz")
    save_state(p, kagc.agc_init())
    # different structure entirely
    with pytest.raises(ValueError, match="different state structure"):
        load_state(p, kpll.pll_init())
    # same structure, wrong leaf shapes
    import jax
    import jax.numpy as jnp
    wide = jax.tree.map(lambda v: jnp.broadcast_to(v, (4,)), kagc.agc_init())
    with pytest.raises(ValueError, match="shape"):
        load_state(p, wide)
    # the happy path still round-trips
    st = load_state(p, kagc.agc_init())
    assert float(st.g) == float(kagc.agc_init().g)
