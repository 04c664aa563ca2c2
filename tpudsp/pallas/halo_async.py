"""Compute-overlapped halo exchange for the time-sharded bank front end
(SURVEY.md sections 2.3/5 "pltpu.make_async_remote_copy"; round-1 VERDICT
"do this" #5).

The ppermute halo path (tpudsp/parallel/halo.py) serializes: exchange the
(taps1-1)-sample input halo, THEN run the front-end matmul. Here one
Pallas kernel per shard:

1. starts an async inter-chip RDMA of this shard's input tail to the
   right time neighbor (ring over the ``time`` mesh axis),
2. computes every INTERIOR output tile of the strided channel-filter
   matmul while the DMA is in flight -- interior outputs read only local
   samples, and for the default bank (128 taps, decimate 10) they are
   ~99.9% of the block,
3. waits on the RDMA and computes the single BOUNDARY tile from the
   received halo (the globally-first shard substitutes the block-carried
   tail).

The matmul is the same wide-MXU formulation as
kernels/decimate.strided_cfir_matmul_wide (windows = Kc shifted frame
slices; complex packed into one real (S, 2*K1) @ (2*K1, 2*C) product), so
the ppermute and async paths agree to float precision -- pinned by
tests/test_halo_async.py on the virtual CPU mesh (interpret mode; the
same kernel lowers through Mosaic on a real TPU mesh).

Tiles stream HBM -> VMEM with explicit async copies, so VMEM holds one
(span, ) input slice + one (tile, 2C) output tile regardless of block
length.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, xi_ref, send_ref, TT_ref, out_ref,
            halo_ref, xv_ref, yv_ref, xw_ref,
            rdma_send_sem, rdma_recv_sem, load_sem, store_sem,
            *, axis_name, n_shards, D1, Kc, halo_len, S, nj, C2, interpret,
            off):
    """off: static wire-format offset. None = float planes (complex64
    ingest, loads go straight to the f32 tile). Otherwise xr/xi are RAW
    integer wire planes (int16: off=0.0, taps carry 1/32767; RTL-SDR
    uint8: off=127.5, taps carry 1/127.5): tiles load at WIRE WIDTH into
    xw_ref (2 or 4 B/sample of HBM traffic, and the RDMA halo rides ICI
    at wire width too), then center/convert on the VPU into the f32
    tile. Centering before the dot is algebraically the offset-folded
    dc-subtraction of kernels/decimate.strided_cfir_matmul_wide_u8
    (float rounding differs; pinned to tolerance)."""
    win = Kc * D1
    span = (S - 1) * D1 + win
    wire = off is not None
    my = lax.axis_index(axis_name)
    # axis_index carries the axis in its varying-axes set; literals mixed
    # into the ring arithmetic must be explicitly pcast-to-varying for the
    # interpret-mode replication checker (a physical no-op on TPU)
    vary = ((lambda v: lax.pcast(v, (axis_name,), to='varying'))
            if interpret else (lambda v: v))
    right = lax.rem(my + vary(jnp.int32(1)), vary(jnp.int32(n_shards)))

    # 1. halo RDMA to the right neighbor, in flight through step 2.
    # device_id as a dict: unnamed mesh axes default to this device's own
    # coordinate (ring stays within e.g. a fixed 'channel' row). NOTE: the
    # interpret-mode discharge supports single-named-axis meshes only and
    # wants a bare scalar (jax dma_start_partial_discharge_rule raises
    # NotImplementedError beyond that); Mosaic lowers the dict form on
    # real TPU meshes of any shape. The end-to-end interpret pin therefore
    # runs ShardedBank on a time-only mesh (tests/test_halo_async.py).
    rdma = pltpu.make_async_remote_copy(
        src_ref=send_ref, dst_ref=halo_ref,
        send_sem=rdma_send_sem, recv_sem=rdma_recv_sem,
        device_id=right if interpret else {axis_name: right},
        device_id_type=pltpu.DeviceIdType.MESH)
    rdma.start()

    TT = TT_ref[...]  # (2*win, 2C)

    def tile_outputs(xb):
        """xb: (span,) x (2,) f32 -> (S, 2C) f32 via the wide matmul."""
        xr, xi = xb
        M = S + Kc - 1

        def windows(v):
            F = v[: M * D1].reshape(M, D1)
            return jnp.concatenate([F[c:c + S] for c in range(Kc)], axis=1)

        W = jnp.concatenate([windows(xr), windows(xi)], axis=1)  # (S, 2win)
        return jnp.dot(W, TT, preferred_element_type=jnp.float32)

    def store(s, Y):
        yv_ref[...] = Y
        cp = pltpu.make_async_copy(yv_ref, out_ref.at[pl.ds(s, S)], store_sem)
        cp.start()
        cp.wait()

    def load_planes(xs, dst_off, count):
        """HBM [xs, xs+count) of both planes -> f32 tile at dst_off
        (wire: stage through the wire-width scratch, convert on VPU)."""
        tgt = xw_ref if wire else xv_ref
        for p, src in ((0, xr_ref), (1, xi_ref)):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(xs, count)],
                tgt.at[p, pl.ds(dst_off, count)], load_sem)
            cp.start()
            cp.wait()
        if wire:
            xv_ref[0, pl.ds(dst_off, count)] = (
                xw_ref[0, pl.ds(dst_off, count)].astype(jnp.float32)
                - jnp.float32(off))
            xv_ref[1, pl.ds(dst_off, count)] = (
                xw_ref[1, pl.ds(dst_off, count)].astype(jnp.float32)
                - jnp.float32(off))

    # 2. interior tiles (outputs [S, nj)), overlapped with the RDMA
    n_tiles = -(-(nj - S) // S) if nj > S else 0

    if n_tiles > 0:  # static: a zero-trip loop must not trace OOB slices
        def body(t, _):
            s = jnp.minimum((t + 1) * S, nj - S)  # clamp: last tile overlaps
            load_planes(s * D1 - halo_len, 0, span)
            store(s, tile_outputs((xv_ref[0], xv_ref[1])))
            return _

        lax.fori_loop(0, n_tiles, body, 0)

    # 3. boundary tile (outputs [0, S)): wait for the halo, prepend it.
    # The globally-first shard's correct fill is the block-carried tail --
    # delivered through the ring itself: the LAST shard sends the carried
    # tail instead of its input tail (selected host-side in
    # bank_front_async), so no in-kernel select is needed.
    rdma.wait()
    load_planes(0, halo_len, span - halo_len)
    if wire:
        xv_ref[0, pl.ds(0, halo_len)] = (
            halo_ref[0].astype(jnp.float32) - jnp.float32(off))
        xv_ref[1, pl.ds(0, halo_len)] = (
            halo_ref[1].astype(jnp.float32) - jnp.float32(off))
    else:
        xv_ref[0, pl.ds(0, halo_len)] = halo_ref[0]
        xv_ref[1, pl.ds(0, halo_len)] = halo_ref[1]
    store(0, tile_outputs((xv_ref[0], xv_ref[1])))


def bank_front_async(iq_loc, tail, Tre, Tim, D1: int, nj: int,
                     axis_name: str, n_shards: int, tile: int = 1024,
                     interpret: bool = False):
    """Drop-in for the ppermute-halo + strided_cfir_matmul_wide front end
    of parallel/bank.sharded_bank_step (call under shard_map over
    ``axis_name``).

    iq_loc: (n_loc,) complex64 local slice, OR a RAW wire-format
    (n_loc, 2) int16/uint8 slice (Tre/Tim then carry the folded wire
    scale, chains/bank.build(input_format=...)); tail: the matching
    (taps1-1,)/(taps1-1, 2) block-carried fill for the leftmost shard;
    Tre/Tim: (C, Kc, D1) blocked correlation-order taps. Returns y1m
    (C, nj) complex64. Wire ingest keeps HBM reads AND the RDMA halo at
    wire width (2-4 B/sample instead of 8)."""
    C, Kc, D1_ = Tre.shape
    assert D1_ == D1
    win = Kc * D1
    halo_len = tail.shape[0]
    S = min(tile, nj)
    if S * D1 < halo_len:
        raise ValueError("tile too small: S*D1 must cover the halo")
    span = (S - 1) * D1 + win

    wire = iq_loc.ndim == 2
    if wire:
        wdt = iq_loc.dtype
        # uint8 wire value is (b - 127.5)/127.5: center in-kernel (off),
        # scale pre-folded into the taps; int16 is pure scale (off 0)
        off = 127.5 if wdt == jnp.uint8 else 0.0
        pad_val = 127 if wdt == jnp.uint8 else 0
        xr = iq_loc[:, 0]
        xi = iq_loc[:, 1]
    else:
        wdt = jnp.float32
        off = None
        pad_val = 0
        xr = iq_loc.real.astype(jnp.float32)
        xi = iq_loc.imag.astype(jnp.float32)
    # input may be shorter than the largest window reach (win - D1 -
    # halo_len short, covered by zero taps in the ppermute path's X);
    # pad explicitly so tile loads stay in bounds
    pad = max(0, (nj - 1) * D1 + win - halo_len - iq_loc.shape[0])
    if pad:
        xr = jnp.pad(xr, (0, pad), constant_values=pad_val)
        xi = jnp.pad(xi, (0, pad), constant_values=pad_val)
    send_in = jnp.stack([xr[iq_loc.shape[0] - halo_len: iq_loc.shape[0]],
                         xi[iq_loc.shape[0] - halo_len: iq_loc.shape[0]]])
    if wire:
        tail2 = jnp.stack([tail[:, 0], tail[:, 1]]).astype(wdt)
    else:
        tail2 = jnp.stack([tail.real, tail.imag]).astype(jnp.float32)
    # ring payload: the LAST shard feeds the block-carried tail to shard 0
    # (its own input tail is next block's carry, kept by the caller); all
    # other shards send their input tail to their right neighbor. Selected
    # here, outside the kernel, where shard_map's replication tracking
    # handles the axis_index-varying predicate natively.
    is_last = lax.axis_index(axis_name) == (n_shards - 1)
    send = jnp.where(is_last, tail2, send_in)
    Tr = Tre.reshape(C, win).T
    Ti = Tim.reshape(C, win).T
    TT = jnp.concatenate(
        [jnp.concatenate([Tr, Ti], axis=1),
         jnp.concatenate([-Ti, Tr], axis=1)], axis=0)  # (2*win, 2C)

    kern = partial(_kernel, axis_name=axis_name, n_shards=n_shards,
                   D1=D1, Kc=Kc, halo_len=halo_len, S=S, nj=nj, C2=2 * C,
                   interpret=interpret, off=off)
    if interpret:
        # the interpret-mode discharge re-traces the kernel with ref
        # values carrying their varying-axes sets; replicated operands
        # (the taps) must be explicitly marked varying so every in-kernel
        # primitive sees matching vma (physical no-op)
        need = frozenset((axis_name,)) - jax.typeof(TT).vma
        if need:
            TT = lax.pcast(TT, tuple(need), to='varying')
    # under shard_map's replication checking the output's varying-mesh-axes
    # set must be declared: it varies over every axis any input varies over
    # (the time axis via iq, plus the channel axis when taps are sharded)
    vma = frozenset()
    for v in (xr, xi, tail2, send, TT):
        vma = vma | jax.typeof(v).vma
    Y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nj, 2 * C), jnp.float32, vma=vma),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),    # xr
                  pl.BlockSpec(memory_space=pl.ANY),    # xi
                  pl.BlockSpec(memory_space=pltpu.VMEM),  # send
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # TT
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, halo_len), wdt),               # halo dst (wire w)
            pltpu.VMEM((2, span), jnp.float32),           # f32 input tile
            pltpu.VMEM((S, 2 * C), jnp.float32),          # output tile
            # wire-width staging tile ((1,1) placeholder on the f32 path)
            pltpu.VMEM((2, span) if wire else (1, 1), wdt),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(xr, xi, send, TT)
    return (Y[:, :C].T + 1j * Y[:, C:].T).astype(jnp.complex64)
