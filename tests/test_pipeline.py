"""Stage-parallel (PP analog) pipelined AM receiver: streamed output must
equal the single-chip fused chain exactly, with one-block latency
(SURVEY.md section 2.3 "PP" row; gap #3 of the round-1 PARITY list)."""

import numpy as np
import jax.numpy as jnp

from tpudsp.chains.am import AMConfig, AMReceiver
from tpudsp.parallel.pipeline import PipelinedAMReceiver, make_stage_mesh
from tests.util import snr_db


def _am_iq(n, cfg, seed=0):
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1000.0 / cfg.iq_rate * t)
    rng = np.random.default_rng(seed)
    x = ((1.0 + 0.5 * msg) * 0.3
         * np.exp(2j * np.pi * 200.0 / cfg.iq_rate * t))
    return (x + 0.001 * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))).astype(np.complex64)


def test_pipeline_matches_single_chip():
    cfg = AMConfig()
    block = 125_000
    n_blocks = 3
    iq = _am_iq(n_blocks * block, cfg)

    ref = AMReceiver(cfg, block_len=block, plan="fused", exact=False)
    pcm_ref = np.concatenate(
        [np.asarray(ref(iq[i * block:(i + 1) * block]))
         for i in range(n_blocks)])

    pipe = PipelinedAMReceiver(cfg, block_len=block, mesh=make_stage_mesh())
    out = []
    for i in range(n_blocks):
        pcm = pipe(iq[i * block:(i + 1) * block])
        if i == 0:
            assert pcm is None  # fill bubble
        else:
            out.append(np.asarray(pcm))
    out.append(np.asarray(pipe.flush()))
    pcm_pipe = np.concatenate(out)

    assert pcm_pipe.shape == pcm_ref.shape
    assert snr_db(pcm_ref, pcm_pipe) > 120.0


def test_pipeline_block_size_validation():
    cfg = AMConfig()
    pipe = PipelinedAMReceiver(cfg, block_len=125_000)
    try:
        pipe(jnp.zeros((1000,), jnp.complex64))
    except ValueError:
        pass
    else:
        raise AssertionError("short block must raise")


def test_pipeline_flush_resets_stream():
    """flush() terminates the stream: a new stream fed afterwards must
    reproduce a fresh receiver's output (round-1 ADVICE: the drained
    zero-block state used to leak into the next stream silently)."""
    cfg = AMConfig()
    block = 125_000
    iq = _am_iq(2 * block, cfg, seed=7)

    pipe = PipelinedAMReceiver(cfg, block_len=block, mesh=make_stage_mesh())
    pipe(iq[:block])
    pipe.flush()

    # second stream through the SAME receiver
    out = [pipe(iq[:block]), pipe(iq[block:]), pipe.flush()]
    assert out[0] is None  # fill bubble again: stream restarted
    got = np.concatenate([np.asarray(p) for p in out[1:]])

    fresh = PipelinedAMReceiver(cfg, block_len=block, mesh=make_stage_mesh())
    ref = [fresh(iq[:block]), fresh(iq[block:]), fresh.flush()]
    want = np.concatenate([np.asarray(p) for p in ref[1:]])
    np.testing.assert_array_equal(got, want)


def test_pipeline_wire_format_matches_converted():
    """PipelinedAMReceiver(input_format='i16'/'u8'): only stage 0 touches
    wire samples (conversion inside its fused matmul; the inter-stage
    activation stays complex64); output must match the c64 pipeline on
    converted input. flush() drains with a wire-format zero block."""
    import pytest

    cfg = AMConfig()
    block = 125_000
    n_blocks = 3
    iq = _am_iq(n_blocks * block, cfg)

    for fmt in ("i16", "u8"):
        if fmt == "i16":
            w = np.stack([np.round(iq.real * 32767 * 0.5),
                          np.round(iq.imag * 32767 * 0.5)],
                         axis=1).astype(np.int16)
            c64 = ((w[:, 0] + 1j * w[:, 1]) / 32767.0).astype(np.complex64)
        else:
            w = np.stack([np.round(iq.real * 127.5 * 0.9 + 127.5),
                          np.round(iq.imag * 127.5 * 0.9 + 127.5)],
                         axis=1).clip(0, 255).astype(np.uint8)
            c64 = ((w[:, 0] - 127.5) / 127.5
                   + 1j * (w[:, 1] - 127.5) / 127.5).astype(np.complex64)

        ref = PipelinedAMReceiver(cfg, block_len=block,
                                  mesh=make_stage_mesh())
        pw = PipelinedAMReceiver(cfg, block_len=block,
                                 mesh=make_stage_mesh(), input_format=fmt)
        outs_r, outs_w = [], []
        for i in range(n_blocks):
            r = ref(c64[i * block:(i + 1) * block])
            v = pw(w[i * block:(i + 1) * block])
            if i:
                outs_r.append(np.asarray(r))
                outs_w.append(np.asarray(v))
        outs_r.append(np.asarray(ref.flush()))
        outs_w.append(np.asarray(pw.flush()))
        y_r = np.concatenate(outs_r)
        y_w = np.concatenate(outs_w)
        # u8's half-LSB tail init rings the first fused window only
        skip = 64 if fmt == "u8" else 0
        got = snr_db(y_r[skip:], y_w[skip:])
        assert got > (60.0 if fmt == "u8" else 85.0), (fmt, got)

        with pytest.raises(TypeError, match="expects"):
            pw(c64[:block])
