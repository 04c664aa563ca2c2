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
