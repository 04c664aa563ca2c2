#!/usr/bin/env python
"""Program-size ladder for the axon relay's big-program d2h death.

Round-4 forensics (TPU_ATTEMPTS.md) established a dichotomy: device->
host reads survive trivial-program loads and die PERMANENTLY for the
claim the moment the full AM-chain program is compiled/loaded (even a
~1 s cache-hit load). The middle was never probed. This tool runs ONE
claim through a ladder of ~9 programs of monotonically growing HLO
size, smallest first; after each program's load+execute it verifies a
4-byte d2h fetch with claim-relative timestamps. The largest surviving
rung IS the relay's threshold, measured in one session; surviving
rungs also get a real work-capped chained-dispatch throughput number
(the same honesty rules as bench.py: carry-dependent inputs, fetch-
forced clock, HBM roofline guard).

On the first post-load d2h death the ladder stops measuring (round-4
telemetry: that death never heals in-claim) and, unless --no-warm-tail,
keeps COMPILING the remaining rungs so the terminal-side staged cache
is warm for the next session (compiles work while d2h-wedged).

Artifact: TPU_LADDER.json at the repo root -- a list of session
records, each with per-rung {name, hlo_bytes, compile_s, T_*, fetch_ok,
rate rows}. Flushes after every rung (a wedge mid-run keeps the data).

Usage:
  python tools/tpu_ladder.py            # default backend (axon,cpu)
  python tools/tpu_ladder.py --cpu      # validate the script on CPU
  python tools/tpu_ladder.py --budget 2400 --max-rung r6_am_chain_250k

Protocol: run via tools/tpu_attempt.sh conventions -- relay quiet
>= 30 min first, ONE client, never cold-killed (SIGINT only).
"""
from __future__ import annotations

import json
import os
import sys
import time

T0 = time.time()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "TPU_LADDER.json")
HBM_PEAK = 819.2e9  # v5e; only used when platform == tpu


def T():
    return time.time() - T0


def log(msg):
    print(f"[T+{T():7.1f}s] {msg}", file=sys.stderr, flush=True)


def flush(session):
    try:
        with open(OUT) as f:
            sessions = json.load(f)
    except Exception:
        sessions = []
    sessions = [s for s in sessions if s.get("id") != session["id"]]
    sessions.append(session)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sessions, f, indent=1)
    os.replace(tmp, OUT)


def main():
    import datetime
    budget = float(next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                         if a == "--budget"), 2700))
    max_rung = next((sys.argv[i + 1] for i, a in enumerate(sys.argv)
                     if a == "--max-rung"), None)
    import numpy as np
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("TPUDSP_JAX_CACHE",
                                         "/tmp/tpudsp_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compile cache unavailable: {e}")
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.device_kind} ({dev.platform})")
    session = {
        "id": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"),
        "platform": str(dev.platform),
        "device_kind": str(dev.device_kind),
        "rungs": [],
    }

    d2h_dead = [False]

    def fetch(a, what, retries=2, wait=30.0):
        """4-byte d2h with claim-relative timestamps; bounded retries
        (post-load deaths never healed in-claim in 6 rounds of attempts,
        so patience here is short)."""
        k = 0
        while True:
            t = T()
            try:
                v = np.asarray(a)
                log(f"  {what}: fetch ok")
                return True, v, t
            except Exception as e:
                msg = f"{type(e).__name__}: {str(e)[:100]}"
                log(f"  {what}: fetch DEAD ({msg})")
                if k >= retries:
                    return False, msg, t
                k += 1
                time.sleep(wait)

    # ---- rung builders ------------------------------------------------
    # Every rung returns (run, carry0, x, n_samples, bytes_per_sample):
    #   run: jitted (carry, x) -> carry', where carry = (state..., acc)
    #   and acc (f32 scalar, last leaf) depends on ALL compute; inputs
    #   are perturbed by a carry-dependent phase so chained dispatches
    #   never see identical bytes (bench.py honesty rule #1).
    # All inputs are generated ON DEVICE by jitted programs.

    def gen_iq(n, scale=0.3):
        def g():
            t = jnp.arange(n, dtype=jnp.float32)
            msg = jnp.sin(2 * jnp.pi * 1e-3 * t)
            ph = 2 * jnp.pi * 1e-4 * t
            return ((1.0 + 0.5 * msg) * scale
                    * jnp.exp(1j * ph)).astype(jnp.complex64)
        return jax.block_until_ready(jax.jit(g)())

    def cphase(acc):
        return jnp.exp(1j * (0.001 * acc + 0.7)).astype(jnp.complex64)

    def rung_trivial():
        x = jax.block_until_ready(
            jax.jit(lambda: jnp.arange(8.0, dtype=jnp.float32))())

        @jax.jit
        def run(carry, v):
            (acc,) = carry
            return (acc + jnp.sum(v + 0.001 * acc),)
        return run, (jnp.float32(0.0),), x, 8, 4

    def rung_matmul(m=512):
        def g():
            a = (jnp.arange(m * m, dtype=jnp.float32) % 7.0 - 3.0) / 3.0
            return a.reshape(m, m)
        x = jax.block_until_ready(jax.jit(g)())

        @jax.jit
        def run(carry, A):
            (acc,) = carry
            Ap = A + 1e-6 * acc
            return (acc + jnp.sum(Ap @ Ap) * 1e-6,)
        return run, (jnp.float32(0.0),), x, m * m, 4

    def rung_fir_1ch(n=1_000_000, K=60, Q=10):
        from tpudsp.design import firdes
        from tpudsp.kernels import decimate as kdec
        from tpudsp.utils.hostbuild import host_build

        def mk():
            h = firdes.kaiser_lowpass(K, 0.45 / Q, 60.0)[::-1]
            Tt = kdec.plan_phase_taps(h[None, :].astype(np.float32), Q)
            return jnp.asarray(Tt)  # (1, Kc, Q): single channel
        Tre = host_build(mk)
        x = gen_iq(n + K - 1)
        nj = n // Q

        @jax.jit
        def run(carry, v):
            (acc,) = carry
            y = kdec.strided_cfir_matmul(v * cphase(acc), Tre,
                                         jnp.zeros_like(Tre), Q, nj)
            return (acc + jnp.real(jnp.sum(y)).astype(jnp.float32),)
        return run, (jnp.float32(0.0),), x, n, 8

    def _bank16(fmt="c64"):
        from tpudsp.chains.bank import BankConfig, build as bbuild
        from tpudsp.utils.hostbuild import host_build
        cfg = BankConfig(freqs=tuple(
            float(f) for f in np.linspace(-1e6, 1e6, 16, endpoint=False)))
        p, s = host_build(bbuild, cfg, fmt)
        return cfg, p, s

    def rung_frontend16(n=1_000_000):
        from tpudsp.kernels import decimate as kdec
        cfg, p, s = _bank16()
        K1, D1 = cfg.taps1, cfg.decim1
        x = gen_iq(n)
        tail0 = s.in_tail
        nj = n // D1

        @jax.jit
        def run(carry, v):
            tail, acc = carry
            X = jnp.concatenate([tail, v * cphase(acc)])
            y1 = kdec.strided_cfir_matmul_wide(X, p.taps_re, p.taps_im,
                                               D1, nj)
            da = jnp.real(jnp.sum(y1)).astype(jnp.float32)
            return X[-(K1 - 1):], acc + da
        return run, (tail0, jnp.float32(0.0)), x, n, 8

    def _am(block):
        from tpudsp.chains.am import AMConfig, build as abuild
        from tpudsp.utils.hostbuild import host_build
        cfg = AMConfig()
        p, s, n_out = host_build(abuild, cfg, block)
        return cfg, p, s, n_out

    def rung_am_frontend(n=1_000_000):
        from tpudsp.chains.am import _rational
        from tpudsp.kernels import decimate as kdec
        cfg, p, s, n_out = _am(n)
        P, Q = _rational(cfg.rate)
        nj = n_out // P
        x = gen_iq(n)
        tail0 = s.rs_tail

        @jax.jit
        def run(carry, v):
            tail, acc = carry
            tail2, y48 = kdec.fused_frontend_apply_shared(
                p.taps_fused, tail, v * cphase(acc), Q, nj)
            return tail2, acc + jnp.real(jnp.sum(y48)).astype(jnp.float32)
        return run, (tail0, jnp.float32(0.0)), x, n, 8

    def rung_am_backend(n=1_000_000):
        from tpudsp.chains import am as cam
        cfg, p, s, n_out = _am(n)

        def g():
            t = jnp.arange(n_out, dtype=jnp.float32)
            return ((1.0 + 0.5 * jnp.sin(2 * jnp.pi * 0.02 * t)) * 0.3
                    * jnp.exp(1j * 2 * jnp.pi * 0.004 * t)
                    ).astype(jnp.complex64)
        y48 = jax.block_until_ready(jax.jit(g)())
        st0 = (s.agc, s.am, s.deemph)

        @jax.jit
        def run(carry, v):
            agc, am, de, acc = carry
            st = s._replace(agc=agc, am=am, deemph=de)
            agc2, am2, de2, pcm, _ = cam._back_end(
                p, st, v * cphase(acc), cfg, False)
            return agc2, am2, de2, acc + jnp.sum(pcm).astype(jnp.float32)
        return run, st0 + (jnp.float32(0.0),), y48, n_out, 8

    def rung_am_chain(block):
        from tpudsp.chains.am import am_step_fused
        from functools import partial
        cfg, p, s, n_out = _am(block)
        x = gen_iq(block)
        step = partial(am_step_fused, cfg=cfg, exact=False)

        @jax.jit
        def run(carry, v):
            st, acc = carry
            st2, (pcm, _) = step(p, st, v * cphase(acc))
            return st2, acc + jnp.sum(pcm).astype(jnp.float32)
        return run, (s, jnp.float32(0.0)), x, block, 8

    RUNGS = [
        ("r0_trivial", rung_trivial),
        ("r1_matmul512", rung_matmul),
        ("r2_fir_1ch_1M", rung_fir_1ch),
        ("r3_frontend16_1M", rung_frontend16),
        ("r4_am_frontend_1M", rung_am_frontend),
        ("r5_am_backend_1M", rung_am_backend),
        ("r6_am_chain_250k", lambda: rung_am_chain(250_000)),
        ("r7_am_chain_1M", lambda: rung_am_chain(1_000_000)),
        ("r8_am_chain_4M", lambda: rung_am_chain(4_000_000)),
    ]

    def acc_of(carry):
        return carry[-1]

    def measure(run, carry, x, n, bps, rec):
        """Work-capped chained-dispatch throughput: G dispatches of ONE
        block each linked through the carry, clock stopped by a verified
        4-byte fetch of the final acc (bench.py honesty rules)."""
        G, walls = 1, []
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            c = carry
            for _g in range(G):
                c = run(c, x)
            ok, v, _t = fetch(acc_of(c), f"timing G={G}", retries=0)
            if not ok:
                rec["rate_error"] = v
                return carry, False
            wall = time.perf_counter() - t0
            carry = c
            per = wall / G
            if best is None or per < best:
                best = per
            walls.append((G, wall))
            if wall > 1.0 or G >= 16:
                break
            G *= 2
        sps = n / best
        implied = sps * bps
        rec["rate"] = {
            "samples_per_s": round(sps, 1),
            "ms_per_block_best": round(best * 1e3, 4),
            "groups": walls[-1][0],
            "implied_input_GB_per_s": round(implied / 1e9, 1),
        }
        if on_tpu:
            rec["rate"]["hbm_roofline_frac"] = round(implied / HBM_PEAK, 3)
            if implied > HBM_PEAK:
                rec["rate"]["invalid"] = "exceeds HBM roofline"
        log(f"  rate: {sps/1e9:.3f} Gsamp/s ({best*1e3:.3f} ms/block, "
            f"{implied/1e9:.0f} GB/s implied)")
        return carry, True

    stopped = None
    for name, mk in RUNGS:
        if T() > budget:
            log(f"budget {budget:.0f}s spent; stopping at {name}")
            break
        rec = {"name": name, "T_start": round(T(), 1)}
        session["rungs"].append(rec)
        try:
            run, carry, x, n, bps = mk()
            rec["n_samples"] = int(n)
        except Exception as e:
            rec["error"] = f"build: {type(e).__name__}: {str(e)[:120]}"
            log(f"{name}: build failed ({rec['error']})")
            flush(session)
            continue
        try:
            lowered = run.lower(carry, x)
            rec["hlo_bytes"] = len(lowered.as_text())
            tc = time.perf_counter()
            compiled = lowered.compile()
            rec["compile_s"] = round(time.perf_counter() - tc, 2)
            rec["T_compile_done"] = round(T(), 1)
            log(f"{name}: hlo {rec['hlo_bytes']/1e3:.0f} kB, compile "
                f"{rec['compile_s']}s")
        except Exception as e:
            rec["error"] = f"compile: {type(e).__name__}: {str(e)[:120]}"
            log(f"{name}: compile failed ({rec['error']})")
            flush(session)
            continue
        if d2h_dead[0]:
            # warm-tail mode: compile-only for the terminal cache
            rec["warm_only"] = True
            flush(session)
            continue
        try:
            c2 = compiled(carry, x)
        except Exception as e:
            rec["error"] = f"exec: {type(e).__name__}: {str(e)[:120]}"
            log(f"{name}: execute failed ({rec['error']})")
            flush(session)
            continue
        ok, v, t = fetch(acc_of(c2), f"{name} post-load", retries=2)
        rec["fetch_ok"] = bool(ok)
        rec["T_fetch"] = round(t, 1)
        if not ok:
            rec["fetch_error"] = v
            stopped = name
            d2h_dead[0] = True
            log(f"*** d2h DIED at rung {name} (hlo "
                f"{rec['hlo_bytes']/1e3:.0f} kB) -- threshold found")
            flush(session)
            if "--no-warm-tail" in sys.argv:
                break
            continue
        _, rate_ok = measure(run, c2, x, n, bps, rec)
        if not rate_ok and not d2h_dead[0]:
            # the TIMING fetch died (post-load one was fine): record as
            # a during-measurement death, stop measuring
            stopped = name
            d2h_dead[0] = True
            log(f"*** d2h died DURING {name}'s measurement")
        flush(session)
        if max_rung and name == max_rung:
            log(f"--max-rung {max_rung} reached; stopping")
            break

    session["stopped_at"] = stopped
    survived = [r["name"] for r in session["rungs"] if r.get("fetch_ok")]
    session["summary"] = {
        "largest_surviving": survived[-1] if survived else None,
        "died_at": stopped,
        "d2h_dead": d2h_dead[0],
    }
    flush(session)
    log(f"ladder done: survived={survived} died_at={stopped}")
    print(json.dumps(session["summary"]), flush=True)


if __name__ == "__main__":
    main()
