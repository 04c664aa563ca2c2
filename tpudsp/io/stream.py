"""Streaming executor: drive any receiver chain from raw radio bytes.

The reference leaves the real-time plumbing to user code — its README
pattern (reference README.md:53-58) is a radio-driver callback that calls
the chain synchronously per block, so conversion, DSP and audio handling
all serialize on one thread. Here that loop is a runtime component:

    radio thread ──push(bytes)──▶ native SPSC ring (io/native/ingest.cpp)
                                        │ pump thread
                                        ▼
            frame fixed block ─▶ native int16/u8→c64 ─▶ receiver step (jit)
                                        │ async device dispatch
                                        ▼
                                  bounded audio queue ─▶ pop_audio()/iter

Because the receiver's step is jitted, calling it only *enqueues* device
work — the pump immediately returns to framing/converting the next block,
so host-side byte conversion of block k+1 overlaps device compute of
block k (JAX async dispatch). Backpressure is physical: if the consumer
falls behind, the audio queue fills, the pump stalls, the ring fills, and
the ring drops whole writes (counted, never torn) — exactly what a
real-time SDR front end must do.

Determinism: blocks flow through the receiver in push order on one pump
thread, so the carried-state evolution — and therefore the audio — is
identical to calling ``receiver(block)`` serially (pinned by
tests/test_stream_runtime.py).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Optional

import numpy as np

from .ingest import IQStream


class StreamRuntime:
    """Run a receiver chain as a streaming service.

    receiver: any stateful chain callable ``receiver(iq_block) -> audio``
        over fixed-size complex64 blocks (AMReceiver, ReceiverBank,
        WBFMStereoReceiver, ChannelizedBank, the sharded variants, or a
        compat-API composition wrapped in a function). ``block_len`` is
        taken from ``receiver.block_len`` unless given.
    sample_format: 'int16' (1/32767 scaling, reference utility.hpp:61-69),
        'uint8' (RTL-SDR style), or the raw passthrough twins
        'int16_raw' / 'uint8_raw' (no host conversion: the receiver gets
        the (N, 2) wire samples — pair with a chain built with
        input_format='i16'/'u8' for 2-4x less host->device and HBM
        ingest traffic).
    on_audio: optional callback ``on_audio(audio, meta)`` invoked on the
        pump thread per block (meta carries the block index and the
        receiver's per-block metrics when it exposes ``.metrics``). When
        None, audio is buffered in a bounded queue for ``pop_audio()``.
    on_event: optional callback ``on_event(event)`` fired on the pump
        thread after each block for every squelch transition found in the
        block's ``metrics.squelch_modes`` tensor — the reference's
        AGC ``onRise`` mid-loop callback (agc.hpp:119-122, intended to
        reset downstream demods on squelch open, agc_docs.cpp:93-97)
        delivered the events-become-data way (SURVEY section 3.5): the
        kernel records the FSM state per sample, the host fires
        callbacks between blocks. Each event is a dict with ``kind``
        ('rise'/'fall'), ``channel`` (None for single-channel chains),
        ``sample`` (offset within the block at the tensor's rate), and
        ``block``. Registering on_event syncs the mode tensor to host
        each block; leave it None on throughput-critical paths.
    capacity_blocks: ring capacity; overflow drops whole pushes (counted).
    max_audio_blocks: audio-queue bound; the pump blocks when full
        (backpressure into the ring).
    """

    def __init__(self, receiver: Callable[[Any], Any],
                 block_len: Optional[int] = None,
                 sample_format: str = "int16",
                 on_audio: Optional[Callable[[Any, dict], None]] = None,
                 on_event: Optional[Callable[[dict], None]] = None,
                 capacity_blocks: int = 64,
                 max_audio_blocks: int = 256):
        if block_len is None:
            block_len = getattr(receiver, "block_len", None)
            if block_len is None:
                raise ValueError(
                    "receiver has no .block_len; pass block_len explicitly")
        self.receiver = receiver
        self.block_len = int(block_len)
        self._stream = IQStream(self.block_len,
                                capacity_blocks=capacity_blocks,
                                sample_format=sample_format)
        self._on_audio = on_audio
        self._on_event = on_event
        self._audio: "queue.Queue" = queue.Queue(maxsize=max_audio_blocks)
        self._data = threading.Event()    # bytes arrived / stop requested
        self._stopping = False
        self._drain = True
        self._error: Optional[BaseException] = None
        self.blocks_processed = 0
        self._pump = threading.Thread(target=self._run, name="tpudsp-pump",
                                      daemon=True)
        self._pump.start()

    # -- producer side (radio-driver thread) --------------------------------

    def push(self, byts: bytes) -> int:
        """Feed raw IQ bytes; returns bytes accepted (0 = dropped whole)."""
        self._raise_if_failed()
        if self._stopping:
            raise RuntimeError("push() after stop(): runtime is stopped")
        n = self._stream.push(byts)
        self._data.set()
        return n

    # -- consumer side -------------------------------------------------------

    def pop_audio(self, timeout: Optional[float] = None):
        """Next audio block as np.ndarray, or None on timeout/end of
        stream. Only valid without an on_audio callback."""
        if self._on_audio is not None:
            raise RuntimeError("audio is routed to on_audio callback")
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            self._raise_if_failed()
            wait = 0.1
            if deadline is not None:
                wait = min(wait, deadline - time.monotonic())
                if wait <= 0:
                    return None
            try:
                item = self._audio.get(timeout=wait)
            except queue.Empty:
                if self._stopping and not self._pump.is_alive():
                    return None
                continue
            return item

    def __iter__(self):
        while True:
            a = self.pop_audio()
            if a is None:
                return
            yield a

    def stop(self, drain: bool = True) -> None:
        """Stop the pump. drain=True first processes every complete block
        already in the ring (a partial tail block is discarded, as in the
        reference's fixed-size callback framing).

        While draining, the audio-queue bound is lifted so stop() cannot
        deadlock against a consumer that only starts reading after stop()
        returns (the documented consume-after-stop pattern). The extra
        memory is bounded: at most ``capacity_blocks`` ring blocks remain
        to drain.
        """
        self._drain = drain
        self._stopping = True
        if drain:
            # queue.Queue re-checks maxsize under its mutex on every put;
            # 0 means unbounded, so a pump blocked in put() proceeds on
            # its next timed retry instead of deadlocking against join().
            with self._audio.mutex:
                self._audio.maxsize = 0
                self._audio.not_full.notify_all()
        self._data.set()
        self._pump.join()
        self._raise_if_failed()

    @property
    def stats(self) -> dict:
        return {
            "blocks_processed": self.blocks_processed,
            "dropped_bytes": self._stream.dropped,
            "pending_bytes": self._stream.pending_bytes,
            "audio_backlog": self._audio.qsize(),
        }

    # -- pump ----------------------------------------------------------------

    def _raise_if_failed(self):
        # _error stays set once the pump fails: every thread that touches
        # the runtime afterwards (producer push, consumer pop, stop) sees
        # the same failure instead of only the first caller.
        if self._error is not None:
            self._stopping = True
            raise self._error

    def _fire_events(self, meta: dict) -> None:
        from ..chains.metrics import squelch_events
        metrics = meta["metrics"]
        modes = getattr(metrics, "squelch_modes", None)
        if modes is None:
            return
        for ev in squelch_events(modes):  # host sync: opt-in via on_event
            ev["block"] = meta["block"]
            self._on_event(ev)

    def _run(self):
        try:
            while True:
                iq = self._stream.pop_block()
                if iq is None:
                    if self._stopping:
                        if not self._drain:
                            return
                        # Drain barrier (measured race, round 5): that
                        # pop's ring read can START before a concurrent
                        # push()'s ring write and return None, after
                        # which stop() sets _stopping -- exiting here
                        # would strand complete blocks in the ring with
                        # no error (observed under load: seen == [],
                        # pending_bytes == 2 blocks). Once _stopping is
                        # OBSERVED, every push that returned before
                        # stop() was called is visible in the ring
                        # (push happens-before stop in the producer,
                        # _stopping publication synchronizes with this
                        # read), so one fresh pop decides: None now
                        # really means drained.
                        iq = self._stream.pop_block()
                        if iq is None:
                            return
                    else:
                        self._data.wait(timeout=0.05)
                        self._data.clear()
                        continue
                if self._stopping and not self._drain:
                    return
                audio = self.receiver(iq)  # jitted: enqueues device work
                meta = {"block": self.blocks_processed,
                        "metrics": getattr(self.receiver, "metrics", None)}
                self.blocks_processed += 1
                if self._on_event is not None:
                    self._fire_events(meta)
                if self._on_audio is not None:
                    self._on_audio(audio, meta)
                else:
                    # materialize on host only when handing over, so the
                    # device stays ahead of the queue consumer
                    out = np.asarray(audio)
                    while True:  # bounded put that can still honor stop()
                        try:
                            self._audio.put(out, timeout=0.1)
                            break
                        except queue.Full:
                            if self._stopping and not self._drain:
                                return
        except BaseException as e:  # surfaced on the caller's next call
            self._error = e
