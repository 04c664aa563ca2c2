#!/usr/bin/env python
"""Throughput benchmark: IQ samples/s/chip through the full AM receiver
chain (BASELINE.json metric; config 1).

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's implied sustained throughput of
2 Msps complex IQ on the author's desktop CPU (BASELINE.md).

Robustness: the axon TPU tunnel in this environment can wedge (a client
killed mid-claim blocks the next claim for its grant timeout), which
stalls the very first device transfer indefinitely. The measurement
therefore runs in a subprocess with a deadline; on stall/failure it
retries once, then falls back to the CPU backend so a result line is
always produced (the platform used is reported in the JSON).

Extra per-stage numbers go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REFERENCE_BASELINE_SPS = 2_000_000.0  # BASELINE.md reference-implied
_IMPL_FLAG = "--impl"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _make_rate_stream(log):
    """Streaming-throughput measurer: ONE dispatch running `iters` blocks
    chained through the carried state on device (lax.fori_loop).
    Host-side repeated dispatches of the same executable measure
    artifactually fast through the remote tunnel (above the HBM
    roofline), so per-block timing must come from a device-side loop
    whose data dependency forces real sequential execution. A cheap
    audio-sum accumulates into the carry so the demod work cannot be
    dead-code-eliminated."""
    import time
    import jax
    import jax.numpy as jnp
    from jax import lax

    def rate_stream(name, step, params, state0, x, n_samples, iters=10):
        # params/state/x are jit ARGUMENTS (closure-captured device
        # arrays would be inlined as MLIR constants, which fetches them
        # to host -- unsupported through the remote backend). Every
        # dispatch carries a fresh `salt` scalar folded into the carry:
        # the remote runner serves REPEATED IDENTICAL executions from a
        # cache (measured: "throughput" above the HBM roofline), so no
        # two timed dispatches may have identical arguments.
        @jax.jit
        def many(p, st, v, salt):
            def body(i, carry):
                s, acc = carry
                s2, out = step(p, s, v)
                leaf = jax.tree.leaves(out)[0]
                return s2, acc + jnp.sum(leaf).astype(jnp.float32)

            return lax.fori_loop(0, iters, body, (st, salt))

        jax.block_until_ready(many(params, state0, x, jnp.float32(-1.0)))
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(params, state0, x, jnp.float32(r)))
            best = min(best, (time.perf_counter() - t0) / iters)
        log(f"{name}: {best*1e3:.2f} ms -> {n_samples/best/1e9:.2f} Gsamp/s")
        return n_samples / best

    return rate_stream


def _bench_secondary(log):
    """Optional extra configs (BASELINE configs 2/3/4/5-core) to stderr,
    all on non-zero synthetic signals."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    rate_stream = _make_rate_stream(log)

    def noise_iq(n, seed=0, scale=0.1):
        rng = np.random.default_rng(seed)
        return jax.device_put(jnp.asarray(
            (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64) * scale))

    from tpudsp.chains.bank import BankConfig, build as bbuild, bank_step

    # config 2: WBFM broadcast at 2.4 Msps -- mono (single-channel fm
    # bank, wrapper.cpp:265 rates scaled to the 2.4M input) and stereo
    # (600k composite decode + 48k two-phase decimation)
    n2 = 2_000_000  # keeps the stereo composite scans at 500k samples
    x2 = noise_iq(n2, seed=2)
    cfg_m = BankConfig(freqs=(0.0,), iq_rate=2_400_000.0, demod="fm",
                       decim1=10, decim2=5, kd=75_000.0 / 240_000.0)
    pm, sm = bbuild(cfg_m)
    rate_stream("wbfm mono (config 2)", partial(bank_step, cfg=cfg_m),
                pm, sm, x2, n2)
    from tpudsp.chains.wbfm import WBFMStereoReceiver, _stereo_step
    rx2s = WBFMStereoReceiver(block_len=n2)
    rate_stream("wbfm stereo (config 2)",
                lambda p, st, v: _stereo_step(p, st, v, cfg=rx2s.cfg),
                rx2s._params, rx2s.state, x2, n2)

    # config 3: 16-channel bank
    cfg16 = BankConfig(freqs=tuple(float(f) for f in
                                   np.linspace(-1e6, 1e6, 16, endpoint=False)))
    p, s = bbuild(cfg16)
    n = 8_000_000
    x = noise_iq(n, seed=3)
    rate_stream("bank16 (config 3)", partial(bank_step, cfg=cfg16),
                p, s, x, n)

    # config 4: 1024-channel channelized bank
    from tpudsp.chains.channelizer import (
        ChannelizedBankConfig, bank_build, bank_step as chstep)
    ccfg = ChannelizedBankConfig()
    cp, cs = bank_build(ccfg)
    nc = 1024 * 16384
    xc = noise_iq(nc, seed=4)
    rate_stream("channelized bank 1024ch (config 4)",
                partial(chstep, cfg=ccfg), cp, cs, xc, nc)

    # config 5 core: the wideband scanner on ONE chip (time axis = 1);
    # multi-chip scaling is measured by tpudsp.bench_scaling when a mesh
    # is available
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.multihost import ShardedScanner
    sc = ShardedScanner(ccfg, make_mesh(1, 1), block_len=nc)
    rate_stream("scanner 1-chip (config 5 core)",
                lambda p_, st, v: sc._step(p_, st, v),
                sc.params, sc.state, xc, nc)


def _impl(platform: str):
    """Runs in the subprocess: measure and print one JSON line."""
    import time
    import numpy as np
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tpudsp.chains.am import AMConfig, build, am_step_fused

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    cfg = AMConfig()
    # 8 s of IQ at 2 Msps (128 MB on device; block*rate = 384000 outputs):
    # large blocks amortize dispatch until the chain is HBM-bandwidth-bound
    block = 16_000_000
    params, state, n_out = build(cfg, block)

    t = np.arange(block)
    msg = np.sin(2 * np.pi * 1000.0 / cfg.iq_rate * t)
    iq = ((1.0 + 0.5 * msg) * 0.3
          * np.exp(2j * np.pi * 200.0 / cfg.iq_rate * t)).astype(np.complex64)
    iq_j = jax.device_put(jnp.asarray(iq))

    rate_stream = _make_rate_stream(log)
    sps = rate_stream(f"am_chain fused [{dev.platform}]",
                      partial(am_step_fused, cfg=cfg, exact=False),
                      params, state, iq_j, block)

    # pallas fused back end variant: report whichever is faster as the metric
    try:
        sps_p = rate_stream("am_chain fused+pallas-backend",
                            partial(am_step_fused, cfg=cfg, exact=False,
                                    backend="pallas"),
                            params, state, iq_j, block)
        sps = max(sps, sps_p)
    except Exception as e:
        log(f"pallas-backend bench skipped: {type(e).__name__}: {e}")
    if "--all" in sys.argv:
        try:
            _bench_secondary(log)
        except Exception as e:  # secondary configs must not break the line
            log(f"secondary bench failed: {type(e).__name__}: {e}")
    print(json.dumps({
        "metric": "am_chain_iq_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / REFERENCE_BASELINE_SPS, 2),
        "platform": str(dev.platform),
    }), flush=True)


def main():
    if _IMPL_FLAG in sys.argv:
        _impl(sys.argv[sys.argv.index(_IMPL_FLAG) + 1])
        return
    here = os.path.dirname(os.path.abspath(__file__))
    long = 900 if "--all" in sys.argv else 480
    attempts = [("default", long), ("default", 300), ("cpu", 600)]
    for platform, deadline in attempts:
        try:
            extra = ["--all"] if "--all" in sys.argv else []
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), _IMPL_FLAG,
                 platform] + extra,
                timeout=deadline, capture_output=True, text=True, cwd=here)
            sys.stderr.write(r.stderr)
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
            if r.returncode == 0 and line:
                print(line, flush=True)
                return
            log(f"bench attempt ({platform}) failed rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"bench attempt ({platform}) stalled past {deadline}s "
                "(wedged TPU tunnel?); retrying")
    log("all bench attempts failed")
    sys.exit(1)


if __name__ == "__main__":
    main()
