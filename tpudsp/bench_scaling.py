"""Scaling-efficiency harness (SURVEY.md section 4 class 5; BASELINE
target: >= 80% efficiency at N >= 2 hosts).

Measures the time-sharded receiver bank at every power-of-two time-shard
count the available devices allow, against the single-device baseline:

    efficiency(N) = throughput(N) / (N * throughput(1))

On this round's single-chip environment the harness exercises the virtual
CPU mesh (wall-clock efficiency there reflects CPU scheduling, not ICI,
and is reported as such); on a pod slice the same entry point measures the
real thing. Run: python -m tpudsp.bench_scaling [nchan] [block_exp]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def measure(n_time: int, nchan: int, block: int, iters: int = 5):
    import jax
    import jax.numpy as jnp
    from tpudsp.chains.bank import BankConfig
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.bank import ShardedBank

    cfg = BankConfig(
        freqs=tuple(float(f) for f in
                    np.linspace(-1e6, 1e6, nchan, endpoint=False)))
    mesh = make_mesh(1, n_time)
    bank = ShardedBank(cfg, mesh, block_len=block)
    iq = jnp.zeros((block,), jnp.complex64)
    out = bank(iq)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = bank(iq)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return block / dt


def main():
    import jax
    nchan = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    block0 = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    ndev = len(jax.devices())
    print(f"devices: {ndev} x {jax.devices()[0].device_kind}")
    base = None
    n = 1
    while n <= ndev:
        block = block0 - block0 % (50 * n)  # per-N divisibility
        sps = measure(n, nchan, block)
        if base is None:
            base = sps
        eff = sps / (n * base)
        print(f"time_shards={n}: {sps/1e9:.3f} Gsamp/s, "
              f"efficiency vs 1-shard: {eff*100:.1f}%")
        n *= 2


if __name__ == "__main__":
    main()
