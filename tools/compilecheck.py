#!/usr/bin/env python
"""Mosaic/XLA compile-coverage artifact (round-5 VERDICT #6).

The Pallas kernels have executed only in interpret mode on CPU; real-
TPU EXECUTION is blocked by the relay's big-program d2h death
(TPU_ATTEMPTS.md). What CAN be pinned from this environment is the
compile frontier: which programs lower + compile for which platform.
This tool enumerates every Pallas kernel and every chain/sharded
program variant, compiles each, and writes COMPILECHECK.json rows
{program, platform, ok, seconds | error, ts} -- the committed record of
what "never ran on silicon" means (everything below compiles; only
execution evidence is missing).

Modes:
  --cpu    8-device virtual CPU mesh: everything compiles, including
           the sharded programs and interpret-mode Pallas.
  default  axon TPU backend, single chip: Mosaic-lowers the Pallas
           kernels and compiles the single-chip chain programs for TPU.
           Sharded multi-chip programs are attempted via AOT topology
           lowering and recorded as unavailable if the relay backend
           exposes no multi-chip topology (it exposes one chip).

Compiles are harmless in every observed relay state (remote compiles
work even while d2h-wedged -- TPU_ATTEMPTS.md attempt 5), but this is
still a TPU client: never run concurrently with another one.
"""
from __future__ import annotations

import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "COMPILECHECK.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def merge(rows):
    try:
        with open(OUT) as f:
            prior = json.load(f)
    except Exception:
        prior = []
    keyed = {(r["program"], r["platform"]): r for r in prior}
    for r in rows:
        keyed[(r["program"], r["platform"])] = r
    out = sorted(keyed.values(), key=lambda r: (r["platform"], r["program"]))
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, OUT)


def main():
    import numpy as np
    import jax

    cpu_mode = "--cpu" in sys.argv
    if cpu_mode:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
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
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    import jax.numpy as jnp
    from functools import partial

    dev = jax.devices()[0]
    platform = str(dev.platform)
    n_dev = len([d for d in jax.devices() if d.platform == platform])
    log(f"device: {dev.device_kind} ({platform}), n={n_dev}")
    ts = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")
    rows = []

    def check(program, fn, **tags):
        t0 = time.perf_counter()
        try:
            fn()
            rows.append({"program": program, "platform": platform,
                         "ok": True,
                         "seconds": round(time.perf_counter() - t0, 2),
                         "ts": ts, **tags})
            log(f"  ok   {program} ({rows[-1]['seconds']}s)")
        except Exception as e:
            rows.append({"program": program, "platform": platform,
                         "ok": False,
                         "error": f"{type(e).__name__}: {str(e)[:140]}",
                         "ts": ts, **tags})
            log(f"  FAIL {program}: {rows[-1]['error']}")
        merge(rows)

    from tpudsp.utils.hostbuild import host_build

    # ---- Pallas kernels (compiled NON-interpret: Mosaic on TPU) -------
    from tpudsp.kernels import agc as kagc
    from tpudsp.kernels import am_backend as kab
    from tpudsp.kernels.warmup import warmup_for, chunk_for

    w = warmup_for(agc_alpha=0.01, pll_bw=kab.PLL_BW)
    amb = host_build(kab.make_params, kagc.make_params(alpha=0.01),
                     jnp.float32(0.5), jnp.float32(0.1), jnp.float32(0.9),
                     carrier=True)
    # inputs are abstract ShapeDtypeStructs: .lower() needs no real
    # arrays, and eager jnp.zeros on the axon backend is a per-op remote
    # compile that degraded relay states reject outright
    n48 = 4 * chunk_for(w)
    x48 = jax.ShapeDtypeStruct((n48,), jnp.complex64)
    x48_1 = jax.ShapeDtypeStruct((1, n48), jnp.complex64)

    def c_agc():
        from tpudsp.pallas.agc_scan import agc_chunked_pallas
        p = host_build(kagc.make_params, alpha=0.01)
        jax.jit(lambda st, v: agc_chunked_pallas(
            p, st, v, chunk=chunk_for(w), warmup=w, interpret=cpu_mode)
        ).lower(host_build(kagc.agc_init), x48).compile()

    def c_front():
        from tpudsp.pallas.am_backend_scan import front_chunked_pallas
        st = kab.FrontState(agc=host_build(kagc.agc_init),
                            pll=host_build(
                                lambda: __import__(
                                    "tpudsp.kernels.pll",
                                    fromlist=["pll_init"]).pll_init()))
        jax.jit(lambda s, v: front_chunked_pallas(
            amb, s, v, warmup=w, interpret=cpu_mode)
        ).lower(jax.tree.map(lambda a: a[None], st), x48_1).compile()

    def c_back():
        from tpudsp.pallas.am_backend_scan import am_backend_chunked_pallas
        st = host_build(kab.init_state)
        jax.jit(lambda s, v: am_backend_chunked_pallas(
            amb, s, v, warmup=w, interpret=cpu_mode)
        ).lower(st, x48).compile()

    def c_patan2():
        from tpudsp.pallas.math import patan2
        import jax.experimental.pallas as pl

        def kern(y_ref, x_ref, o_ref):
            o_ref[...] = patan2(y_ref[...], x_ref[...])

        v = jax.ShapeDtypeStruct((8, 128), jnp.float32)
        jax.jit(lambda a, b: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            interpret=cpu_mode)(a, b)
        ).lower(v, v).compile()

    ptag = {"interpret": True} if cpu_mode else {}
    check("pallas.agc_scan", c_agc, **ptag)
    check("pallas.am_backend_scan.front", c_front, **ptag)
    check("pallas.am_backend_scan.full", c_back, **ptag)
    check("pallas.math.patan2", c_patan2, **ptag)

    # halo_async needs a multi-device mesh (make_async_remote_copy ring)
    def c_halo():
        from jax.sharding import Mesh
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from tpudsp.pallas.halo_async import bank_front_async
        from tpudsp.kernels import decimate as kdec
        from tpudsp.design import firdes
        if n_dev < 2:
            raise RuntimeError(f"needs >= 2 {platform} devices, have "
                               f"{n_dev} (single-chip relay)")
        devs = np.asarray(jax.devices()[:n_dev])
        mesh = Mesh(devs, ("time",))
        D1, K = 10, 60

        def mk():
            h1 = firdes.kaiser_lowpass(K, 0.45 / D1, 60.0)
            hm = (h1[None, :] * np.ones((4, 1)))[:, ::-1]
            return (jnp.asarray(kdec.plan_phase_taps(
                hm.astype(np.float32), D1)),) * 2
        tre, tim = host_build(mk)
        nloc = 1280
        iq = jax.ShapeDtypeStruct((n_dev * nloc,), jnp.complex64)
        tail = host_build(lambda: jnp.zeros((K - 1,), jnp.complex64))

        def step(v):
            return bank_front_async(v, tail, tre, tim, D1, nloc // D1,
                                    axis_name="time", n_shards=n_dev,
                                    interpret=cpu_mode)

        jax.jit(shard_map(step, mesh=mesh, in_specs=P("time"),
                          out_specs=P(None, "time"),
                          check_vma=False)).lower(iq).compile()

    check("pallas.halo_async.bank_front", c_halo, **ptag)

    # ---- single-chip chain programs ----------------------------------
    from tpudsp.chains.am import AMConfig, build as abuild, am_step_fused
    acfg = AMConfig()
    block = 125_000

    def mk_chain(fmt="c64", backend="xla"):
        def go():
            p, s, _ = host_build(abuild, acfg, block, fmt)
            if fmt == "i16":
                iq = jax.ShapeDtypeStruct((block, 2), jnp.int16)
            elif fmt == "u8":
                iq = jax.ShapeDtypeStruct((block, 2), jnp.uint8)
            else:
                iq = jax.ShapeDtypeStruct((block,), jnp.complex64)
            jax.jit(partial(am_step_fused, cfg=acfg, exact=False,
                            backend=backend)).lower(p, s, iq).compile()
        return go

    check("chain.am_fused.c64", mk_chain())
    check("chain.am_fused.i16", mk_chain("i16"))
    check("chain.am_fused.u8", mk_chain("u8"))
    check("chain.am_fused.pallas_backend", mk_chain(backend="pallas"))

    def c_bank16():
        from tpudsp.chains.bank import BankConfig, build as bbuild, \
            bank_step
        cfg = BankConfig(freqs=tuple(
            float(f) for f in np.linspace(-1e6, 1e6, 16, endpoint=False)))
        p, s = host_build(bbuild, cfg)
        jax.jit(partial(bank_step, cfg=cfg)).lower(
            p, s, jax.ShapeDtypeStruct((500_000,), jnp.complex64)
        ).compile()

    def c_wbfm():
        from tpudsp.chains.wbfm import WBFMStereoReceiver, _stereo_step
        rx = WBFMStereoReceiver(block_len=500_000)
        jax.jit(partial(_stereo_step, cfg=rx.cfg)).lower(
            rx._params, rx.state,
            jax.ShapeDtypeStruct((500_000,), jnp.complex64)).compile()

    def c_chan():
        from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                               bank_build, bank_step)
        ccfg = ChannelizedBankConfig()
        p, s = host_build(bank_build, ccfg)
        jax.jit(partial(bank_step, cfg=ccfg)).lower(
            p, s, jax.ShapeDtypeStruct((1024 * 512,), jnp.complex64)
        ).compile()

    check("chain.bank16", c_bank16)
    check("chain.wbfm_stereo", c_wbfm)
    check("chain.channelized_1024", c_chan)

    # ---- sharded programs (need n_dev >= 2 on this platform) ----------
    def sharded(program, mk):
        def go():
            if n_dev < 2:
                raise RuntimeError(
                    f"needs >= 2 {platform} devices, have {n_dev} "
                    "(single-chip relay exposes no multi-chip topology)")
            mk()
        check(program, go)

    def c_sbank():
        from tpudsp.chains.bank import BankConfig
        from tpudsp.parallel import make_mesh
        from tpudsp.parallel.bank import ShardedBank
        freqs = tuple(float(f) for f in
                      np.linspace(-9e5, 9e5, 8, endpoint=False))
        demods = ("am", "fm", "usb", "am") * 2
        cfg = BankConfig(freqs=freqs, iq_rate=2_400_000.0, demod=demods,
                         am_coherent=True)
        b = ShardedBank(cfg, make_mesh(2, n_dev // 2),
                        block_len=cfg.decim1 * cfg.decim2 * n_dev * 256)
        jax.block_until_ready(b(np.zeros((b.block_len,), np.complex64)))

    def c_sam():
        from tpudsp.parallel import ShardedAMReceiver, make_mesh
        blk = max(250_000 * n_dev, 2_000_000)
        blk += -blk % (125 * n_dev)
        sam = ShardedAMReceiver(acfg, make_mesh(1, n_dev), block_len=blk)
        jax.block_until_ready(sam(np.zeros((blk,), np.complex64)))

    def c_scan():
        from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                               ChannelizerConfig)
        from tpudsp.parallel import make_mesh
        from tpudsp.parallel.multihost import ShardedScanner
        ccfg = ChannelizedBankConfig(channelizer=ChannelizerConfig(
            nchan=64, taps_per_branch=8))
        sc = ShardedScanner(ccfg, make_mesh(1, n_dev),
                            block_len=64 * n_dev * 32)
        jax.block_until_ready(sc(np.zeros((sc.block_len,), np.complex64)))

    def c_tp():
        from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                               ChannelizerConfig)
        from tpudsp.parallel import make_mesh
        from tpudsp.parallel.channelizer import ShardedChannelizedBank
        C = max(64, n_dev * n_dev)
        demods = tuple("am" if i % 2 == 0 else "fm" for i in range(C))
        tpb = ShardedChannelizedBank(
            ChannelizedBankConfig(
                channelizer=ChannelizerConfig(nchan=C, taps_per_branch=8),
                demod=demods, am_coherent=True),
            mesh=make_mesh(n_dev, 1), block_len=8 * C * n_dev)
        jax.block_until_ready(tpb(np.zeros((tpb.block_len,), np.complex64)))

    sharded("sharded.bank_mixed_ep", c_sbank)
    sharded("sharded.am_receiver", c_sam)
    sharded("sharded.scanner", c_scan)
    sharded("sharded.tp_channelized_bank", c_tp)

    ok = sum(r["ok"] for r in rows)
    print(json.dumps({"platform": platform, "ok": ok,
                      "total": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
