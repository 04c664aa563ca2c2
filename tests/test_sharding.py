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


def _am_iq(n, iq_rate, freqs):
    t = np.arange(n)
    out = 0
    for i, f in enumerate(freqs):
        m = np.sin(2 * np.pi * (900.0 + 500.0 * i) / iq_rate * t)
        out = out + (1 + 0.5 * m) * 0.3 * np.exp(
            2j * np.pi * (f + 20.0 + 5.0 * i) / iq_rate * t)
    return (out / len(freqs)).astype(np.complex64)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 4)])
def test_sharded_bank_coherent_am(mesh_shape):
    """Time-sharded coherent AM back end: the warmup window rides a
    ppermute halo (entry-state re-derivation at shard boundaries, same
    scheme as the chunked kernels). A (1, 1) mesh is exact; a sharded
    mesh is the documented warmup approximation."""
    iq_rate = 2_400_000.0
    n = 400_000
    freqs = (250_000.0, -400_000.0, 100_000.0, -150_000.0)
    cfg = BankConfig(freqs=freqs, iq_rate=iq_rate, demod="am",
                     am_coherent=True)
    iq = _am_iq(n, iq_rate, freqs)

    ref_bank = ReceiverBank(cfg, block_len=n)
    y_ref = np.asarray(ref_bank(iq))

    mesh = make_mesh(*mesh_shape)
    sb = ShardedBank(cfg, mesh, block_len=n)
    y = np.asarray(sb(iq))
    assert y.shape == y_ref.shape
    settle = y.shape[1] // 4  # AGC/PLL/DC-tracker acquisition
    floor = (1, 1) == mesh_shape and 80.0 or 55.0
    assert snr_db(y_ref[:, settle:], y[:, settle:]) > floor
    # second block exercises the carried front/dc state
    y2 = np.asarray(sb(iq))
    assert np.isfinite(y2).all()


@pytest.mark.parametrize("mesh_shape", [(1, 1), (1, 8), (2, 4)])
def test_sharded_bank_coherent_mixed(mesh_shape):
    """MIXED demod bank with am_coherent under shard_map (the EP
    composition, reference wrapper.cpp:189-199 via per-radio demods):
    channel-local meshes statically gather the AM subgroup (the
    single-chip scheme), channel-sharded meshes run the coherent back
    end on every row and mask-select. (1, 1) reproduces ReceiverBank
    exactly; sharded meshes are the documented warmup approximation."""
    iq_rate = 2_400_000.0
    n = 400_000
    freqs = (250_000.0, -400_000.0, 100_000.0, -150_000.0)
    cfg = BankConfig(freqs=freqs, iq_rate=iq_rate,
                     demod=("am", "fm", "am", "usb"), am_coherent=True)
    iq = _am_iq(n, iq_rate, freqs)

    ref_bank = ReceiverBank(cfg, block_len=n)
    y_ref = np.asarray(ref_bank(iq))

    mesh = make_mesh(*mesh_shape)
    sb = ShardedBank(cfg, mesh, block_len=n)
    y = np.asarray(sb(iq))
    assert y.shape == y_ref.shape
    settle = y.shape[1] // 4  # AGC/PLL/DC-tracker acquisition
    floor = 80.0 if mesh_shape == (1, 1) else 55.0
    assert snr_db(y_ref[:, settle:], y[:, settle:]) > floor
    # second block exercises the carried front/dc state end-to-end
    y2 = np.asarray(sb(iq))
    assert np.isfinite(y2).all()


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


@pytest.mark.parametrize("fmt", ["i16", "u8"])
def test_sharded_bank_wire_format_matches_converted(fmt):
    """ShardedBank(input_format='i16'/'u8') on a (channel, time) mesh:
    the (K1-1)-sample input halo rides the ppermute at wire width; must
    match the c64 sharded bank on converted input, streamed."""
    fs = 2_400_000.0
    cfg = BankConfig(freqs=(-500_000.0, 0.0, 400_000.0, 700_000.0),
                     iq_rate=fs, demod="fm", kd=75_000.0 / 240_000.0)
    n = 200_000
    t = np.arange(2 * n)
    x = sum(0.25 * np.exp(2j * np.pi * (f / fs) * t
                          + 0.3j * np.sin(2 * np.pi * 0.001 * (i + 1) * t))
            for i, f in enumerate(cfg.freqs))
    if fmt == "i16":
        w = np.stack([np.round(np.real(x) * 32767 * 0.5),
                      np.round(np.imag(x) * 32767 * 0.5)],
                     axis=1).astype(np.int16)
        c64 = ((w[:, 0] + 1j * w[:, 1]) / 32767.0).astype(np.complex64)
    else:
        w = np.stack([np.round(np.real(x) * 127.5 * 0.5 + 127.5),
                      np.round(np.imag(x) * 127.5 * 0.5 + 127.5)],
                     axis=1).clip(0, 255).astype(np.uint8)
        c64 = ((w[:, 0] - 127.5) / 127.5
               + 1j * (w[:, 1] - 127.5) / 127.5).astype(np.complex64)

    mesh = make_mesh(2, 4)
    b_c = ShardedBank(cfg, mesh, block_len=n)
    b_w = ShardedBank(cfg, mesh, block_len=n, input_format=fmt)
    floors_skips = (((60.0, 64), (85.0, 0)) if fmt == "u8"
                    else ((85.0, 0), (85.0, 0)))
    for b, (floor, skip) in enumerate(floors_skips):
        y_c = np.asarray(b_c(c64[b * n:(b + 1) * n]))
        y_w = np.asarray(b_w(w[b * n:(b + 1) * n]))
        got = snr_db(y_c[:, skip:], y_w[:, skip:])
        assert got > floor, (fmt, b, got)
