#!/usr/bin/env python
"""Throughput benchmark: IQ samples/s/chip through the full AM receiver
chain (BASELINE.json metric; config 1).

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the reference's implied sustained throughput of
2 Msps complex IQ on the author's desktop CPU (BASELINE.md).

Extra per-stage numbers go to stderr. Runs on the default JAX platform
(the TPU under axon; falls back transparently if only CPU exists).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BASELINE_SPS = 2_000_000.0  # BASELINE.md reference-implied


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_fn(fn, args, n_warmup=2, n_iter=5):
    import jax
    for _ in range(n_warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp
    from tpudsp.chains.am import AMConfig, build, am_step_fused
    from functools import partial

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    cfg = AMConfig()
    block = 4_000_000  # 2 s of IQ at 2 Msps; block*rate = 96000 outputs
    params, state, n_out = build(cfg, block)
    log(f"AM chain: block={block}, n_out={n_out}, "
        f"fused taps {np.asarray(params.taps_fused).shape}")

    rng = np.random.default_rng(0)
    t = np.arange(block)
    msg = np.sin(2 * np.pi * 1000.0 / cfg.iq_rate * t)
    iq = ((1.0 + 0.5 * msg) * 0.3
          * np.exp(2j * np.pi * 200.0 / cfg.iq_rate * t)).astype(np.complex64)
    iq_j = jax.device_put(jnp.asarray(iq))

    step = jax.jit(partial(am_step_fused, cfg=cfg, exact=False))
    # keep state fixed across iterations (steady-state throughput)
    t_step = bench_fn(lambda p, s, x: step(p, s, x)[1][0], (params, state, iq_j))
    sps = block / t_step
    log(f"am_chain fused: {t_step*1e3:.2f} ms/block -> {sps/1e9:.3f} Gsamp/s")

    print(json.dumps({
        "metric": "am_chain_iq_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / REFERENCE_BASELINE_SPS, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
