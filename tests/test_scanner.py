"""Time-sharded wideband scanner (config 5 core): sharded channelizer +
demod bank must reproduce the single-chip ChannelizedBank exactly, and
stream across blocks with carried boundary state."""

import numpy as np

from tpudsp.chains.channelizer import ChannelizedBank, ChannelizedBankConfig, ChannelizerConfig
from tpudsp.parallel import make_mesh
from tpudsp.parallel.multihost import ShardedScanner
from tests.util import snr_db


def _cfg(C=32):
    return ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=3_200_000.0),
        demod="fm", kd=0.25)


def _iq(n, C, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = sum(np.exp(1j * (2 * np.pi * (c / C) * t
                         + 2 * np.pi * 0.1 / C * np.cumsum(
                             np.sin(2 * np.pi * 0.00037 * (i + 1) * t))))
            for i, c in enumerate((3, 11, 25)))
    return (x / 3).astype(np.complex64)


def test_scanner_matches_single_chip():
    C = 32
    cfg = _cfg(C)
    n = C * 2048
    iq = _iq(n, C)
    ref = ChannelizedBank(cfg, block_len=n)
    y_ref = np.asarray(ref(iq))
    mesh = make_mesh(1, 8)
    sc = ShardedScanner(cfg, mesh, block_len=n)
    y = np.asarray(sc(iq))
    assert y.shape == y_ref.shape
    assert snr_db(y_ref, y) > 80.0


def test_scanner_coherent_am_matches_single_chip():
    """Coherent AM back end across time shards (warmup halo scheme):
    tracks the single-chip ChannelizedBank within the documented warmup
    approximation, and exactly on a 1-shard mesh."""
    C = 32
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=3_200_000.0),
        demod="am", am_coherent=True)
    n = C * 16384
    t = np.arange(n)
    x = sum((1 + 0.5 * np.sin(2 * np.pi * 0.0004 * (i + 1) * t)) * 0.4
            * np.exp(2j * np.pi * (c / C + 4e-6) * t)
            for i, c in enumerate((3, 11, 25)))
    iq = (x / 3).astype(np.complex64)
    ref = ChannelizedBank(cfg, block_len=n)
    y_ref = np.asarray(ref(iq))
    for shards, floor in ((1, 80.0), (8, 55.0)):
        sc = ShardedScanner(cfg, make_mesh(1, shards), block_len=n)
        y = np.asarray(sc(iq))
        assert y.shape == y_ref.shape
        settle = y.shape[1] // 4
        # compare the OCCUPIED channels: on empty ones the AGC runs to its
        # gain clamp amplifying float leakage, so shard-boundary state
        # differences there are meaningless noise, not demod error
        for c in (3, 11, 25):
            got = snr_db(y_ref[c, settle:], y[c, settle:])
            assert got > floor, (shards, c, got)


def test_scanner_streaming_blocks():
    C = 32
    cfg = _cfg(C)
    n = C * 1024
    iq = _iq(2 * n, C, seed=1)
    ref = ChannelizedBank(cfg, block_len=2 * n)
    y_ref = np.asarray(ref(iq))
    mesh = make_mesh(1, 4)
    sc = ShardedScanner(cfg, mesh, block_len=n)
    y = np.concatenate([np.asarray(sc(iq[:n])), np.asarray(sc(iq[n:]))], axis=1)
    assert y.shape == y_ref.shape
    assert snr_db(y_ref, y) > 80.0


def test_scanner_oversampled_matches_single_chip():
    """os=2 PFB (flat full-width channel passbands) through the
    time-sharded scanner (round-2 VERDICT missing #5): must reproduce the
    single-chip os=2 ChannelizedBank across shards and blocks."""
    C = 32
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=3_200_000.0, oversample=2,
                                      cutoff_frac=0.95),
        demod="fm", kd=0.25)
    n = C * 2048
    iq = _iq(2 * n, C, seed=3)

    ref = ChannelizedBank(cfg, block_len=n)
    y_ref = np.concatenate([np.asarray(ref(iq[:n])), np.asarray(ref(iq[n:]))],
                           axis=1)
    for shards in (1, 8):
        sc = ShardedScanner(cfg, make_mesh(1, shards), block_len=n)
        y = np.concatenate([np.asarray(sc(iq[:n])), np.asarray(sc(iq[n:]))],
                           axis=1)
        assert y.shape == y_ref.shape == (C, 2 * 2 * n // C)
        settle = y.shape[1] // 8
        for c in (3, 11, 25):
            got = snr_db(y_ref[c, settle:], y[c, settle:])
            assert got > 80.0, (shards, c, got)


def test_scanner_raw_i16_matches_converted():
    """ShardedScanner(input_format='i16'): the wire-format path through
    the time-sharded PFB (int16 boundary halo over ppermute) must match
    the c64 scanner on converted input, across shards and blocks."""
    C = 32
    cfg = _cfg(C)
    n = C * 2048
    x = _iq(2 * n, C, seed=7)
    i16 = np.stack([np.round(x.real * 32767 * 0.5),
                    np.round(x.imag * 32767 * 0.5)],
                   axis=1).astype(np.int16)
    c64 = ((i16[:, 0] + 1j * i16[:, 1]) / 32767.0).astype(np.complex64)

    for shards in (1, 8):
        s_c = ShardedScanner(cfg, make_mesh(1, shards), block_len=n)
        s_i = ShardedScanner(cfg, make_mesh(1, shards), block_len=n,
                             input_format="i16")
        for b in range(2):
            y_c = np.asarray(s_c(c64[b * n:(b + 1) * n]))
            y_i = np.asarray(s_i(i16[b * n:(b + 1) * n]))
            assert y_c.shape == y_i.shape
            # occupied channels only: empty ones FM-demodulate float-level
            # residuals whose arctan2 legitimately differs between the
            # int16 and float accumulation orders
            for ch in (3, 11, 25):
                assert snr_db(y_c[ch], y_i[ch]) > 90.0, (shards, b, ch)


def test_scanner_raw_u8_matches_converted():
    """ShardedScanner(input_format='u8'): the RTL-SDR wire-format path
    through the time-sharded PFB (uint8 boundary halo over ppermute,
    per-branch DC subtraction before the channel IFFT) must match the
    c64 scanner on converted input, across shards and blocks."""
    C = 32
    cfg = _cfg(C)
    n = C * 2048
    x = _iq(2 * n, C, seed=7)
    u8 = np.stack([np.round(x.real * 127.5 * 0.5 + 127.5),
                   np.round(x.imag * 127.5 * 0.5 + 127.5)],
                  axis=1).clip(0, 255).astype(np.uint8)
    c64 = ((u8[:, 0] - 127.5) / 127.5
           + 1j * (u8[:, 1] - 127.5) / 127.5).astype(np.complex64)

    for shards in (1, 8):
        s_c = ShardedScanner(cfg, make_mesh(1, shards), block_len=n)
        s_u = ShardedScanner(cfg, make_mesh(1, shards), block_len=n,
                             input_format="u8")
        # block 0's leftmost shard carries the half-LSB tail-init
        # transient (127 is not exactly zero), which the FM
        # discriminator amplifies across the first T-1 frames: skip
        # that documented prefix, then pin tight
        for b, (floor, skip) in enumerate(((60.0, 64), (85.0, 0))):
            y_c = np.asarray(s_c(c64[b * n:(b + 1) * n]))
            y_u = np.asarray(s_u(u8[b * n:(b + 1) * n]))
            assert y_c.shape == y_u.shape
            # occupied channels only (see the i16 twin above)
            for ch in (3, 11, 25):
                got = snr_db(y_c[ch, skip:], y_u[ch, skip:])
                assert got > floor, (shards, b, ch, got)


def test_sharded_scanner_mixed_demod():
    """Mixed fm/am(+coherent) through the time-sharded scanner must match
    the single-chip mixed ChannelizedBank on OCCUPIED channels (channels
    are local per shard: static AM-subgroup gather; empty channels run
    the AGC to its clamp where boundary state is meaningless noise)."""
    import numpy as np
    import jax.numpy as jnp
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig,
                                           bank_build, bank_step)
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.multihost import ShardedScanner

    C = 16
    # per-shard channel-rate extent must exceed the ~3840-sample warmup
    # window or the entry-state re-derivation cannot converge
    n = C * 8 * 4096
    t = np.arange(n)
    demods = tuple("am" if i % 3 == 0 else "fm" for i in range(C))
    # occupy AM channels 3 and 9 (am rows: 0,3,6,9,12,15) and FM channel 5
    x = sum((1 + 0.5 * np.sin(2 * np.pi * 0.0004 * (i + 1) * t)) * 0.4
            * np.exp(2j * np.pi * (c / C + 4e-6) * t)
            for i, c in enumerate((3, 9)))
    x = x + 0.4 * np.exp(1j * (2 * np.pi * 5 / C * t
                               + 0.5 * np.sin(2 * np.pi * 0.0007 * t)))
    x = (x / 3).astype(np.complex64)
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8),
        demod=demods, am_coherent=True)
    p, s = bank_build(cfg)
    _, (a_ref, _) = bank_step(p, s, jnp.asarray(x), cfg=cfg)
    a_ref = np.asarray(a_ref)

    sc = ShardedScanner(cfg, make_mesh(1, 8), block_len=n)
    a_sh = np.asarray(sc(x))
    assert a_sh.shape == a_ref.shape
    settle = a_ref.shape[1] // 4
    for c in (3, 9, 5):
        err = a_ref[c, settle:] - a_sh[c, settle:]
        snr = 10 * np.log10(np.mean(a_ref[c, settle:] ** 2)
                            / (np.mean(err ** 2) + 1e-30))
        assert snr > 50.0, (c, demods[c], snr)
    assert np.isfinite(np.asarray(sc(x))).all()
