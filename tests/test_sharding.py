"""Multi-device tests on the forced 8-device CPU mesh (SURVEY.md section 4
class 4): sharded execution must reproduce single-chip results exactly
(halo exchange + cross-shard scan carry correctness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpudsp.chains import BankConfig, ReceiverBank
from tpudsp.parallel import make_mesh
from tpudsp.parallel.bank import ShardedBank
from tests.util import snr_db, noise


def _fm_iq(n, iq_rate, freqs, seed=0):
    t = np.arange(n)
    rng = np.random.default_rng(seed)
    out = 0
    for i, f in enumerate(freqs):
        m = np.sin(2 * np.pi * (700.0 + 400.0 * i) / iq_rate * t)
        out = out + np.exp(1j * (2 * np.pi * f / iq_rate * t
                                 + 2 * np.pi * 0.03125 * np.cumsum(m)))
    return (out / len(freqs)).astype(np.complex64)


def test_devices_available():
    assert len(jax.devices()) >= 8  # conftest forces 8 CPU devices


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (1, 1)])
def test_sharded_bank_matches_single_chip(mesh_shape):
    iq_rate = 2_400_000.0
    n = 400_000
    freqs = (250_000.0, -400_000.0, 100_000.0, -150_000.0)
    cfg = BankConfig(freqs=freqs, iq_rate=iq_rate, demod="fm", kd=0.3125)
    iq = _fm_iq(n, iq_rate, freqs)

    ref_bank = ReceiverBank(cfg, block_len=n)
    y_ref = np.asarray(ref_bank(iq))

    mesh = make_mesh(*mesh_shape)
    sb = ShardedBank(cfg, mesh, block_len=n)
    y = np.asarray(sb(iq))
    assert y.shape == y_ref.shape
    assert snr_db(y_ref, y) > 80.0


def test_sharded_bank_streaming_state():
    """Carried state across blocks must match the single-chip bank:
    the same stream split into blocks gives the same audio."""
    iq_rate = 2_400_000.0
    n = 200_000
    freqs = (250_000.0, -400_000.0)
    cfg = BankConfig(freqs=freqs, iq_rate=iq_rate, demod="fm", kd=0.3125)
    iq = _fm_iq(2 * n, iq_rate, freqs, seed=3)

    ref_bank = ReceiverBank(cfg, block_len=2 * n)
    y_ref = np.asarray(ref_bank(iq))

    mesh = make_mesh(2, 4)
    sb = ShardedBank(cfg, mesh, block_len=n)
    y = np.concatenate(
        [np.asarray(sb(iq[:n])), np.asarray(sb(iq[n:]))], axis=1)
    assert y.shape == y_ref.shape
    assert snr_db(y_ref, y) > 80.0
