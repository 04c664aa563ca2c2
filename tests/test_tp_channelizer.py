"""TP-sharded channelizer (distributed two-stage FFT) on the forced
8-device CPU mesh: the sharded transform must reproduce the single-chip
channelizer exactly across devices, block boundaries, and factorizations
(SURVEY.md section 2.3 "TP" row; gap #2 of the round-1 PARITY list)."""

import numpy as np
import jax
import pytest

from tpudsp.chains.channelizer import Channelizer, ChannelizerConfig
from tpudsp.parallel import make_mesh
from tpudsp.parallel.channelizer import ShardedChannelizer, channel_layout
from tests.util import snr_db


def _iq(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n)
            + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.3


@pytest.mark.parametrize("n_dev,C,c1", [(8, 64, None), (8, 128, 16),
                                        (4, 64, None), (1, 64, None)])
def test_tp_channelizer_matches_single_chip(n_dev, C, c1):
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=8, iq_rate=6_400_000.0)
    n = C * 128 * max(n_dev, 1)
    x = _iq(n)

    ref = Channelizer(cfg, block_len=n)
    Y_ref = np.asarray(ref(x))

    mesh = make_mesh(1, n_dev)
    sc = ShardedChannelizer(cfg, mesh, block_len=n, axis_name="time", c1=c1)
    Y = sc(x)
    assert Y.shape == Y_ref.shape
    assert snr_db(Y_ref, Y) > 110.0


def test_tp_channelizer_streaming_state():
    """The same stream split into blocks must match one big single-chip
    block (carried-tail handoff across shard and block boundaries)."""
    C = 64
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=6, iq_rate=6_400_000.0)
    n = C * 64 * 8
    x = _iq(3 * n, seed=5)

    ref = Channelizer(cfg, block_len=3 * n)
    Y_ref = np.asarray(ref(x))

    mesh = make_mesh(1, 8)
    sc = ShardedChannelizer(cfg, mesh, block_len=n, axis_name="time")
    Y = np.concatenate([sc(x[i:i + n]) for i in range(0, 3 * n, n)], axis=0)
    assert snr_db(Y_ref, Y) > 110.0


@pytest.mark.parametrize("n_dev", [8, 1])
def test_tp_channelized_bank_matches_single_chip(n_dev):
    from tpudsp.chains.channelizer import (
        ChannelizedBank, ChannelizedBankConfig)
    from tpudsp.parallel.channelizer import ShardedChannelizedBank

    C = 64
    iq_rate = 6_400_000.0
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8,
                                      iq_rate=iq_rate),
        demod="fm", kd=25_000.0 / (iq_rate / C))
    n = C * 128 * 8
    t = np.arange(n)
    m = np.sin(2 * np.pi * 1500.0 / iq_rate * t)
    x = (0.5 * np.exp(1j * (2 * np.pi * (10 / C) * t
                            + 2 * np.pi * (25_000.0 / iq_rate)
                            * np.cumsum(m)))).astype(np.complex64)

    ref = ChannelizedBank(cfg, block_len=n)
    a_ref = np.asarray(ref(x))

    mesh = make_mesh(1, n_dev)
    sb = ShardedChannelizedBank(cfg, mesh, block_len=n, axis_name="time")
    a = sb(x)
    assert a.shape == a_ref.shape
    # quiet channels FM-demodulate float-level residuals (arctan2 of ~1e-7
    # values), which legitimately differs between FFT orderings; the
    # correctness claim is the ACTIVE channel's audio
    assert snr_db(a_ref[10], a[10]) > 90.0
    # second block exercises carried fd_prev/deemph/tail state
    a_ref2 = np.asarray(ref(x))
    a2 = sb(x)
    assert snr_db(a_ref2[10], a2[10]) > 90.0


@pytest.mark.parametrize("n_dev,floor", [(8, 80.0), (1, 120.0)])
def test_tp_channelized_bank_coherent_am_matches_single_chip(n_dev, floor):
    """Coherent AM (AGC + carrier PLL + DC tracker) behind the TP-sharded
    channelizer (round-2 VERDICT missing #2): after the second all_to_all
    each shard owns the full time axis for its channels, so the feedback
    scans run shard-local and must match the single-chip
    ChannelizedBank(am_coherent=True) on occupied channels."""
    from tpudsp.chains.channelizer import (
        ChannelizedBank, ChannelizedBankConfig)
    from tpudsp.parallel.channelizer import ShardedChannelizedBank

    C = 64
    iq_rate = 6_400_000.0
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=iq_rate),
        demod="am", am_coherent=True)
    n = C * 8192
    t = np.arange(n)
    stations = {10: 1000.0, 33: 2500.0}
    x = sum((1 + 0.5 * np.sin(2 * np.pi * f / iq_rate * t)) * 0.4
            * np.exp(2j * np.pi * (c / C + 4e-6) * t)
            for c, f in stations.items())
    iq = (x / len(stations)).astype(np.complex64)

    ref = ChannelizedBank(cfg, block_len=n // 2)
    a_ref = np.concatenate([np.asarray(ref(iq[: n // 2])),
                            np.asarray(ref(iq[n // 2:]))], axis=1)

    mesh = make_mesh(1, n_dev)
    sb = ShardedChannelizedBank(cfg, mesh, block_len=n // 2,
                                axis_name="time")
    a = np.concatenate([sb(iq[: n // 2]), sb(iq[n // 2:])], axis=1)
    assert a.shape == a_ref.shape
    settle = a.shape[1] // 4
    for c in stations:
        got = snr_db(a_ref[c, settle:], a[c, settle:])
        assert got > floor, (c, got)


def test_channel_layout_roundtrip():
    C1, C2 = 8, 16
    perm = channel_layout(C1, C2)
    assert sorted(perm) == list(range(C1 * C2))
    # layout position c1*C2 + c2 holds natural channel c2*C1 + c1
    assert perm[3 * C2 + 5] == 5 * C1 + 3


def test_tp_channelizer_oversampled_matches_single_chip():
    """os=2 through the distributed transform (odd-frame branch roll in
    place of the post-IFFT parity sign) must match the single-chip os=2
    channelizer across blocks."""
    C = 64
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=8, iq_rate=6_400_000.0,
                            oversample=2, cutoff_frac=0.95)
    n = C * 64 * 8
    x = _iq(2 * n, seed=9)

    ref = Channelizer(cfg, block_len=n)
    Y_ref = np.concatenate([np.asarray(ref(x[i:i + n]))
                            for i in range(0, 2 * n, n)], axis=0)

    mesh = make_mesh(1, 8)
    sc = ShardedChannelizer(cfg, mesh, block_len=n, axis_name="time")
    Y = np.concatenate([sc(x[i:i + n]) for i in range(0, 2 * n, n)], axis=0)
    assert Y.shape == Y_ref.shape == (2 * 2 * n // C, C)
    assert snr_db(Y_ref, Y) > 110.0


@pytest.mark.parametrize("fmt", ["i16", "u8"])
def test_tp_channelizer_wire_format_matches_converted(fmt):
    """ShardedChannelizer(input_format='i16'/'u8'): raw wire slices frame
    at wire width on each shard (uint8/int16 boundary halo over ppermute;
    u8's -127.5 offset subtracted per branch before the distributed FFT)
    and must match the c64 sharded transform on converted input, streamed
    across blocks."""
    C = 64
    cfg = ChannelizerConfig(nchan=C, taps_per_branch=6, iq_rate=6_400_000.0)
    n = C * 64 * 8
    x = _iq(2 * n, seed=9)
    if fmt == "i16":
        w = np.stack([np.round(x.real * 32767 * 0.5),
                      np.round(x.imag * 32767 * 0.5)],
                     axis=1).astype(np.int16)
        c64 = ((w[:, 0] + 1j * w[:, 1]) / 32767.0).astype(np.complex64)
    else:
        w = np.stack([np.round(x.real * 127.5 + 127.5),
                      np.round(x.imag * 127.5 + 127.5)],
                     axis=1).clip(0, 255).astype(np.uint8)
        c64 = ((w[:, 0] - 127.5) / 127.5
               + 1j * (w[:, 1] - 127.5) / 127.5).astype(np.complex64)

    mesh = make_mesh(1, 8)
    s_c = ShardedChannelizer(cfg, mesh, block_len=n, axis_name="time")
    s_w = ShardedChannelizer(cfg, mesh, block_len=n, axis_name="time",
                             input_format=fmt)
    for b in range(2):
        Y_c = s_c(c64[b * n:(b + 1) * n])
        Y_w = s_w(w[b * n:(b + 1) * n])
        # block 0 carries u8's documented half-LSB tail-init transient in
        # the first T-1 frames; skip them, then pin tight
        skip = 8 if (fmt == "u8" and b == 0) else 0
        got = snr_db(Y_c[skip:], Y_w[skip:])
        assert got > 85.0, (fmt, b, got)


@pytest.mark.parametrize("fmt", ["i16", "u8"])
def test_tp_channelized_bank_wire_format_matches_converted(fmt):
    """The full TP bank (distributed FFT + channel-sharded FM demod) on
    raw wire input vs the single-chip ChannelizedBank on converted
    input (layout permutation unwound)."""
    from tpudsp.chains.channelizer import (
        ChannelizedBank, ChannelizedBankConfig)
    from tpudsp.parallel.channelizer import ShardedChannelizedBank

    C = 64
    iq_rate = 6_400_000.0
    n = C * 64 * 8
    t = np.arange(2 * n)
    x = sum(np.exp(1j * (2 * np.pi * (c / C) * t
                         + 2 * np.pi * 0.05 / C * np.cumsum(
                             np.sin(2 * np.pi * 0.0005 * (i + 1) * t))))
            for i, c in enumerate((7, 40))) / 2
    if fmt == "i16":
        w = np.stack([np.round(x.real * 32767 * 0.5),
                      np.round(x.imag * 32767 * 0.5)],
                     axis=1).astype(np.int16)
        c64 = ((w[:, 0] + 1j * w[:, 1]) / 32767.0).astype(np.complex64)
    else:
        w = np.stack([np.round(x.real * 127.5 * 0.9 + 127.5),
                      np.round(x.imag * 127.5 * 0.9 + 127.5)],
                     axis=1).clip(0, 255).astype(np.uint8)
        c64 = ((w[:, 0] - 127.5) / 127.5
               + 1j * (w[:, 1] - 127.5) / 127.5).astype(np.complex64)

    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=iq_rate),
        demod="fm", kd=0.25)
    ref = ChannelizedBank(cfg, block_len=n)
    tp = ShardedChannelizedBank(cfg, make_mesh(1, 8), block_len=n,
                                axis_name="time", input_format=fmt)
    for b, floor in enumerate((60.0, 85.0) if fmt == "u8" else (85.0, 85.0)):
        y_ref = np.asarray(ref(c64[b * n:(b + 1) * n]))
        y_tp = np.asarray(tp(w[b * n:(b + 1) * n]))
        skip = 64 if (fmt == "u8" and b == 0) else 0
        for ch in (7, 40):
            got = snr_db(y_ref[ch, skip:], y_tp[ch, skip:])
            assert got > floor, (fmt, b, ch, got)


def test_sharded_conv_engine_refused():
    """engine='conv' is not plumbed through the sharded front end; it
    must be refused rather than silently measured as 'shift'."""
    import pytest
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig)
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.channelizer import ShardedChannelizer
    from tpudsp.parallel.multihost import ShardedScanner
    ccfg = ChannelizerConfig(nchan=64, taps_per_branch=8, engine="conv")
    with pytest.raises(NotImplementedError):
        ShardedChannelizer(ccfg, make_mesh(1, 1), block_len=64 * 64)
    with pytest.raises(NotImplementedError):
        ShardedScanner(ChannelizedBankConfig(channelizer=ccfg),
                       make_mesh(1, 1), block_len=64 * 64)


def test_tp_channelized_bank_mixed_demod():
    """Mixed fm/am(+coherent) through the TP channelized bank: the
    channel axis is sharded, so the coherent back end runs on every
    local row and the layout-permuted mask selects. Must match the
    single-chip mixed bank exactly (same per-channel scans; a 2-shard
    distributed FFT is float-equivalent)."""
    import numpy as np
    import jax.numpy as jnp
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig,
                                           bank_build, bank_step)
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.channelizer import ShardedChannelizedBank

    C = 16
    n = C * 8 * 64
    rng = np.random.default_rng(17)
    x = ((rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.1
         ).astype(np.complex64)
    demods = tuple("am" if i % 3 == 0 else "fm" for i in range(C))
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8),
        demod=demods, am_coherent=True)
    p, s = bank_build(cfg)
    _, (a_ref, _) = bank_step(p, s, jnp.asarray(x), cfg=cfg)
    a_ref = np.asarray(a_ref)

    tpb = ShardedChannelizedBank(cfg, make_mesh(2, 1), block_len=n)
    a_nat = np.asarray(tpb(x))  # __call__ un-permutes to natural order
    err = a_ref - a_nat
    snr = 10 * np.log10(np.mean(a_ref ** 2) / (np.mean(err ** 2) + 1e-30))
    assert snr > 80.0, snr
