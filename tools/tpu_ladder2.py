#!/usr/bin/env python
"""Ladder pass 2: narrow the relay's d2h death threshold and HARVEST
real silicon rows for everything that survives.

Run-1 findings (TPU_LADDER.json, 2026-08-21): d2h survives a 7 kB-HLO
single-channel FIR-matmul program (measured 0.59 Gsamp/s with verified
fetches -- the first platform=tpu numbers in five rounds) and dies on a
41 kB 16-channel front end. But run-1's rungs CLOSED OVER their tap
arrays, so the 41 kB was mostly inlined constants; and each dispatch
was one block step, so the ~1.5 ms relay RPC dominated the rate.

This pass discriminates the real trigger and fixes both:
  - params are JIT ARGUMENTS: a C=16 front end's HLO is then nearly
    byte-identical to C=1's (shapes only). If C=16-as-args survives,
    the killer was program TEXT size and the real bank front end is
    measurable on silicon; if it dies, the trigger is buffer/executable
    size.
  - surviving rungs are measured with bench.py's rate_stream (work-
    capped traced-bound fori_loop, escalating dispatch groups, carry-
    dependent inputs, fetch-forced clock, HBM roofline guard) -- the
    same honesty rules as the headline bench, so rows merge STRAIGHT
    into bench_all.json as platform:"tpu" stage rows.
  - after the size ladder, a WORK-CAP ladder re-measures the best
    surviving rung at growing per-dispatch work (4M -> 16M -> 64M ->
    256M samples) to amortize the RPC overhead toward the roofline;
    each level's row is banked before the next is tried.

Artifacts: TPU_LADDER.json (session record) + bench_all.json rows
(stage2_* partial programs, plus REAL bench-config rows under their
bench names -- bank16, channelized_1024ch, wbfm_mono/stereo,
am_chain_fused[tpu]/_u8/_i16 -- which merge as measured config rows
and feed bench.py's artifact-headline fallback). Usage:
  python tools/tpu_ladder2.py [--cpu] [--budget 2400]
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


def T():
    return time.time() - T0


def log(msg):
    print(f"[T+{T():7.1f}s] {msg}", file=sys.stderr, flush=True)


def flush_session(session):
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
                         if a == "--budget"), 2400))
    os.environ.setdefault("TPUDSP_BENCH_PATIENCE", "90")  # fail fast
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

    import bench
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    hbm_peak = bench._hbm_peak(dev.device_kind) if on_tpu else None
    bench._CLAIM_T0[0] = T0
    rate_stream = bench._make_rate_stream(log, hbm_peak)
    flush_rows = bench._mk_flush(dev)
    log(f"device: {dev.device_kind} ({dev.platform})")

    session = {
        "id": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ") + "-pass2",
        "platform": str(dev.platform),
        "device_kind": str(dev.device_kind),
        "rungs": [],
    }

    def gen_iq(n):
        def g():
            t = jnp.arange(n, dtype=jnp.float32)
            msg = jnp.sin(2 * jnp.pi * 1e-3 * t)
            ph = 2 * jnp.pi * 1e-4 * t
            return ((1.0 + 0.5 * msg) * 0.3
                    * jnp.exp(1j * ph)).astype(jnp.complex64)
        return jax.block_until_ready(jax.jit(g)())

    def gen_u8(n):
        def g():
            t = jnp.arange(n, dtype=jnp.float32)
            v = ((1.0 + 0.5 * jnp.sin(2 * jnp.pi * 1e-3 * t)) * 0.3
                 * jnp.exp(1j * 2 * jnp.pi * 1e-4 * t))
            return jnp.clip(jnp.round(
                jnp.stack([v.real, v.imag], axis=1) * 127.5 + 127.5),
                0, 255).astype(jnp.uint8)
        return jax.block_until_ready(jax.jit(g)())

    # --- rungs: (params, state, x) step functions, params as ARGS -----
    from tpudsp.design import firdes
    from tpudsp.kernels import decimate as kdec
    from tpudsp.utils.hostbuild import host_build

    N = 1_000_000
    D1 = 10  # decimation of the front-end stage

    def mk_taps(C):
        """C modulated channel taps, planned for the MXU matmul
        (same construction as chains/bank.py:175-185)."""
        def mk():
            K = 60
            h1 = firdes.kaiser_lowpass(K, 0.45 / D1, 60.0)
            w = 2 * np.pi * np.linspace(-0.25, 0.25, C, endpoint=False)
            k = np.arange(K)
            hm = (h1[None, :] * np.exp(1j * w[:, None] * k[None, :]))[:, ::-1]
            tre = kdec.plan_phase_taps(hm.real.astype(np.float32), D1)
            tim = kdec.plan_phase_taps(hm.imag.astype(np.float32), D1)
            return jnp.asarray(tre), jnp.asarray(tim), K
        return host_build(mk)

    def fe_step(params, tail, iq):
        """(C-channel strided FIR matmul front end; tail-carried."""
        tre, tim = params
        K = tre.shape[1] * tre.shape[2]
        X = jnp.concatenate([tail, iq])
        nj = iq.shape[0] // D1
        y1 = kdec.strided_cfir_matmul_wide(X, tre, tim, D1, nj)
        return X[-(K - 1):], y1

    def fe_step_u8(params, tail, iq2):
        tre, tim = params
        K = tre.shape[1] * tre.shape[2]
        X2 = jnp.concatenate([tail, iq2])
        nj = iq2.shape[0] // D1
        y1 = kdec.strided_cfir_matmul_wide_u8(X2, tre, tim, D1, nj)
        return X2[-(K - 1):], y1

    def fe_step_dup(params, tail, iq):
        """Structural 2x: two distinct tap sets over the same input
        (discriminates op-count from arg-shape as the death trigger)."""
        tre1, tim1, tre2, tim2 = params
        K = tre1.shape[1] * tre1.shape[2]
        X = jnp.concatenate([tail, iq])
        nj = iq.shape[0] // D1
        ya = kdec.strided_cfir_matmul_wide(X, tre1, tim1, D1, nj)
        yb = kdec.strided_cfir_matmul_wide(X, tre2, tim2, D1, nj)
        return X[-(K - 1):], ya + yb

    def rung_fe(C, fmt="c64"):
        tre, tim, K = mk_taps(C)
        if fmt == "u8":
            # tails are host-built: eager array creation on the axon
            # device is a per-op remote compile that degraded relay
            # states reject (observed 15:27 session: every fe rung's
            # build died on its eager jnp.zeros/full)
            tail = host_build(lambda: jnp.full((K - 1, 2), 127, jnp.uint8))
            x = gen_u8(N)
            pu8 = host_build(lambda: (tre * (1 / 127.5),
                                      tim * (1 / 127.5)))
            return fe_step_u8, pu8, tail, x, N, 2
        tail = host_build(lambda: jnp.zeros((K - 1,), jnp.complex64))
        return fe_step, (tre, tim), tail, gen_iq(N), N, 8

    def rung_dup16():
        tre1, tim1, K = mk_taps(16)
        tre2, tim2, _ = mk_taps(16)
        tail = host_build(lambda: jnp.zeros((K - 1,), jnp.complex64))
        return fe_step_dup, (tre1, tim1, jnp.flip(tre2, 0), tim2), \
            tail, gen_iq(N), N, 8

    def rung_bank16():
        from functools import partial
        from tpudsp.chains.bank import BankConfig, build as bbuild, \
            bank_step
        cfg = BankConfig(freqs=tuple(
            float(f) for f in np.linspace(-1e6, 1e6, 16, endpoint=False)))
        p, s = host_build(bbuild, cfg)
        n2 = 2_000_000
        return partial(bank_step, cfg=cfg), p, s, gen_iq(n2), n2, 8

    def rung_wbfm_mono():
        from functools import partial
        from tpudsp.chains.bank import BankConfig, build as bbuild, \
            bank_step
        cfg = BankConfig(freqs=(0.0,), iq_rate=2_400_000.0, demod="fm",
                         decim1=10, decim2=5, kd=75_000.0 / 240_000.0)
        p, s = host_build(bbuild, cfg)
        n2 = 500_000
        return partial(bank_step, cfg=cfg), p, s, gen_iq(n2), n2, 8

    def rung_channelized():
        from functools import partial
        from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                               bank_build, bank_step)
        ccfg = ChannelizedBankConfig()
        p, s = host_build(bank_build, ccfg)
        nc = 1024 * 2048
        return partial(bank_step, cfg=ccfg), p, s, gen_iq(nc), nc, 8

    def rung_am_chain(block=250_000, fmt="c64"):
        from functools import partial
        from tpudsp.chains.am import AMConfig, build as abuild, \
            am_step_fused
        acfg = AMConfig()
        p, s, _ = host_build(abuild, acfg, block, fmt)
        step = partial(am_step_fused, cfg=acfg, exact=False)
        if fmt == "u8":
            v = gen_iq(block)
            u8 = jax.block_until_ready(jax.jit(
                lambda w: jnp.clip(jnp.round(jnp.stack(
                    [w.real, w.imag], axis=1) * 127.5 + 127.5),
                    0, 255).astype(jnp.uint8))(v))
            return step, p, s, u8, block, 2
        if fmt == "i16":
            v = gen_iq(block)
            i16 = jax.block_until_ready(jax.jit(
                lambda w: jnp.clip(jnp.round(jnp.stack(
                    [w.real, w.imag], axis=1) * 32767.0),
                    -32767, 32767).astype(jnp.int16))(v))
            return step, p, s, i16, block, 4
        return step, p, s, gen_iq(block), block, 8

    def rung_wbfm_stereo():
        from functools import partial
        from tpudsp.chains.wbfm import WBFMStereoReceiver, _stereo_step
        n2 = 500_000
        rx = WBFMStereoReceiver(block_len=n2)
        return (partial(_stereo_step, cfg=rx.cfg), rx._params, rx.state,
                gen_iq(n2), n2, 8)

    # Ordered by HLO text size (round-5 program-size reductions:
    # MXU-blocked first-order scans + gather-free chunk windows +
    # gather-free overlap-save; chains/am 224->64 kB, wbfm 1362->182 kB,
    # channelized 1024ch 25 kB, bank16 26 kB). A death stops the ladder,
    # so value-per-kB ordering = size ordering. Rungs whose program IS a
    # bench config use the bench row name: a surviving row merges into
    # bench_all.json as the real measured config row, and
    # `bench.py --resume --require-tpu` then emits the TPU headline.
    RUNGS = [
        ("stage2_fe1_c64", lambda: rung_fe(1)),
        ("stage2_fe16_c64", lambda: rung_fe(16)),
        ("stage2_fe16_u8", lambda: rung_fe(16, "u8")),
        ("stage2_fe64_c64", lambda: rung_fe(64)),
        ("stage2_dup16_c64", rung_dup16),
        ("channelized_1024ch", rung_channelized),     # 25 kB, config 4
        ("bank16", rung_bank16),                      # 26 kB, config 3
        ("wbfm_mono", rung_wbfm_mono),                # ~26 kB, config 2
        ("wbfm_stereo", rung_wbfm_stereo),            # 53 kB, config 2
        ("am_chain_fused[tpu]", rung_am_chain),       # 64 kB, config 1
        ("am_chain_fused_u8", lambda: rung_am_chain(fmt="u8")),
        ("am_chain_fused_i16", lambda: rung_am_chain(fmt="i16")),
        ("am_chain_fused_1M",
         lambda: rung_am_chain(block=1_000_000)),     # 85 kB
    ]
    BENCH_CONFIG = {"channelized_1024ch": 4, "bank16": 3,
                    "wbfm_mono": 2, "wbfm_stereo": 2,
                    "am_chain_fused[tpu]": 1, "am_chain_fused_u8": 1,
                    "am_chain_fused_i16": 1, "am_chain_fused_1M": 1}

    dead = [False]
    build_fails = [0]
    banked_rows = []  # bench's flush merges vs a STARTUP snapshot, so
    # every call must carry all rows banked this session

    def try_rung(name, mk, work_cap=4_000_000, iters=64, tag=None):
        rname = tag or name
        rec = {"name": rname, "T_start": round(T(), 1)}
        session["rungs"].append(rec)
        try:
            step, params, st0, x, n, bps = mk()
        except Exception as e:
            rec["error"] = f"build: {type(e).__name__}: {str(e)[:120]}"
            log(f"{rname}: {rec['error']}")
            if "UNIMPLEMENTED" in str(e):
                build_fails[0] += 1
                if build_fails[0] >= 3:
                    # the relay is rejecting compiles/loads themselves
                    # (observed 15:27): nothing downstream can work
                    dead[0] = True
                    log("3 consecutive UNIMPLEMENTED builds: relay "
                        "rejecting program loads; bailing out")
            flush_session(session)
            return None
        try:
            row = rate_stream(rname, step, params, st0, x, n,
                              iters=iters, repeats=3,
                              bytes_per_sample=bps, work_cap=work_cap)
            import re as _re
            base = _re.sub(r"_w\d+M$", "", rname)
            cfg_n = BENCH_CONFIG.get(base, 0)
            row["config"] = cfg_n
            if cfg_n == 0:
                row["stage"] = True  # partial program, not a bench config
            rec["row"] = dict(row)
            banked_rows.append(row)
            flush_rows(list(banked_rows))
            log(f"{rname}: ROW BANKED ({row['value']/1e9:.3f} Gsamp/s)")
            flush_session(session)
            return row
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:140]}"
            rec["error"] = msg
            log(f"{rname}: FAILED ({msg})")
            if "UNIMPLEMENTED" in str(e) or "d2h" in str(e):
                dead[0] = True
            flush_session(session)
            return None

    # --- claim-health gate ---------------------------------------------
    # A claim can be born into a still-wedged relay (observed 14:11:
    # pre-compile probe dead at T+3s, 45 min after the prior death).
    # Unlike a post-big-program-load death, a dead-at-birth claim has
    # loaded nothing and can heal in-process (05:03 telemetry: a 640 s
    # first-fetch stall resolved, then everything worked) -- so probe
    # with patience before spending rungs, and bail out cleanly if the
    # relay never comes up.
    if on_tpu:
        probe = jax.jit(lambda v: v + 1.0)
        ok0 = False
        deadline0 = min(budget * 0.4, 900.0)
        k = 0
        while T() < deadline0:
            try:
                np.asarray(probe(jnp.float32(1.0)))
                ok0 = True
                log(f"claim-health probe ok (try {k})")
                break
            except Exception as e:
                k += 1
                log(f"claim-health probe dead (try {k}): "
                    f"{type(e).__name__}: {str(e)[:90]}; retry in 45s")
                time.sleep(45)
        if not ok0:
            session["summary"] = {"d2h_dead": True, "banked": [],
                                  "born_dead": True, "probe_tries": k}
            flush_session(session)
            log("claim never became healthy; exiting without burning "
                "the rungs")
            print(json.dumps(session["summary"]), flush=True)
            return

    # --- size ladder ---------------------------------------------------
    best = None
    for name, mk in RUNGS:
        if T() > budget:
            log("budget spent; stopping size ladder")
            break
        if dead[0]:
            log(f"{name}: skipped (d2h dead)")
            session["rungs"].append({"name": name, "skipped": "d2h dead"})
            continue
        row = try_rung(name, mk)
        if row is not None and row.get("value"):
            # escalate the HEADLINE program when it survived; otherwise
            # the largest surviving rung
            if best is None or best[0] != "am_chain_fused[tpu]":
                best = (name, mk, row)

    # --- work-cap ladder on the best surviving rung --------------------
    if best is not None and not dead[0]:
        name, mk, _ = best
        for wcap in (16_000_000, 64_000_000, 256_000_000):
            if T() > budget or dead[0]:
                break
            tag = f"{name}_w{wcap//1_000_000}M"
            log(f"work-cap escalation: {tag}")
            try_rung(name, mk, work_cap=wcap, iters=wcap // 1_000_000,
                     tag=tag)

    session["summary"] = {
        "d2h_dead": dead[0],
        "banked": [r["row"]["name"] for r in session["rungs"]
                   if "row" in r],
    }
    flush_session(session)
    log(f"pass-2 done: {session['summary']}")
    print(json.dumps(session["summary"]), flush=True)


if __name__ == "__main__":
    main()
