"""StreamRuntime: the streaming executor must reproduce serial chain
calls exactly (push order == processing order == state evolution), honor
backpressure, and surface receiver errors on the caller thread."""

import threading

import numpy as np
import pytest

from tpudsp.chains.am import AMConfig, AMReceiver
from tpudsp.io import StreamRuntime, bytes_to_iq

BLOCK = 12_500  # * 48k/2M = 300 output samples
N_BLOCKS = 6


def _am_bytes(n, seed=0):
    """AM-modulated int16 IQ bytes (1 kHz message, 200 Hz carrier offset)."""
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1000.0 / 2e6 * t)
    iq = ((1.0 + 0.5 * msg) * 0.3 * np.exp(2j * np.pi * 200.0 / 2e6 * t))
    xs = np.empty(2 * n, np.int16)
    xs[0::2] = np.round(iq.real * 32767 * 0.5)
    xs[1::2] = np.round(iq.imag * 32767 * 0.5)
    return xs.tobytes()


def _serial_reference(raw):
    rx = AMReceiver(AMConfig(), block_len=BLOCK)
    iq = bytes_to_iq(raw)
    return np.concatenate([
        np.asarray(rx(iq[i * BLOCK:(i + 1) * BLOCK]))
        for i in range(N_BLOCKS)])


def test_stream_runtime_matches_serial_exactly():
    raw = _am_bytes(N_BLOCKS * BLOCK)
    want = _serial_reference(raw)

    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK))

    def producer():  # radio-driver thread, odd-sized pushes
        step = 7_777 * 4
        for i in range(0, len(raw), step):
            while rt.push(raw[i:i + step]) == 0:
                pass

    th = threading.Thread(target=producer)
    th.start()
    th.join()
    rt.stop(drain=True)
    got = [a for a in iter(rt)]
    assert rt.blocks_processed == N_BLOCKS
    assert rt.stats["dropped_bytes"] == 0
    np.testing.assert_array_equal(np.concatenate(got), want)


def test_stream_runtime_on_audio_callback_and_metrics():
    raw = _am_bytes(2 * BLOCK)
    seen = []
    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK),
                       on_audio=lambda a, meta: seen.append((a, meta)))
    rt.push(raw)
    rt.stop(drain=True)
    assert [m["block"] for _, m in seen] == [0, 1]
    # the receiver exposes per-block metrics; the runtime forwards them
    assert seen[-1][1]["metrics"] is not None
    assert np.isfinite(float(seen[-1][1]["metrics"].rssi))
    with pytest.raises(RuntimeError):
        rt.pop_audio(timeout=0.01)


def test_stream_runtime_partial_tail_block_discarded():
    raw = _am_bytes(BLOCK + BLOCK // 2)
    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK))
    rt.push(raw)
    rt.stop(drain=True)
    assert rt.blocks_processed == 1
    assert rt.stats["pending_bytes"] == (BLOCK // 2) * 4


def test_stream_runtime_surfaces_receiver_errors():
    def broken(_iq):
        raise ValueError("boom")

    rt = StreamRuntime(broken, block_len=BLOCK)
    rt.push(_am_bytes(BLOCK))
    with pytest.raises(ValueError, match="boom"):
        rt.stop(drain=True)


def test_stream_runtime_block_len_required_for_plain_callables():
    with pytest.raises(ValueError, match="block_len"):
        StreamRuntime(lambda iq: iq)


def test_stream_runtime_stop_drain_does_not_deadlock_on_full_queue():
    # ADVICE r2 medium: with more pending blocks than max_audio_blocks and
    # a consumer that only reads AFTER stop() returns (the documented
    # pattern), stop(drain=True) used to deadlock pump-vs-join. The drain
    # bound is now lifted, so all complete blocks must come through.
    n_blocks = 5
    raw = _am_bytes(n_blocks * BLOCK)
    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK),
                       max_audio_blocks=1)
    rt.push(raw)
    rt.stop(drain=True)  # must return despite the size-1 audio queue
    got = [a for a in iter(rt)]
    assert len(got) == n_blocks
    assert rt.blocks_processed == n_blocks


def test_stream_runtime_push_after_stop_rejected():
    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK))
    rt.push(_am_bytes(BLOCK))
    rt.stop(drain=True)
    with pytest.raises(RuntimeError, match="stop"):
        rt.push(_am_bytes(BLOCK))


def test_stream_runtime_error_stays_visible():
    # ADVICE r2 low: a pump error must be observable by every caller, not
    # swallowed by whichever thread happened to poll first.
    def broken(_iq):
        raise ValueError("boom")

    rt = StreamRuntime(broken, block_len=BLOCK)
    rt.push(_am_bytes(BLOCK))
    rt._pump.join(timeout=10)  # pump dies on the first block
    # the producer thread's push() observes the pump failure ...
    with pytest.raises(ValueError, match="boom"):
        rt.push(_am_bytes(BLOCK))
    # ... and so do stop() and pop_audio(), repeatedly — not just the
    # first caller.
    with pytest.raises(ValueError, match="boom"):
        rt.stop(drain=True)
    with pytest.raises(ValueError, match="boom"):
        rt.pop_audio(timeout=0.01)


def test_stream_runtime_raw_i16_passthrough_matches_converted():
    """sample_format='int16_raw' + AMReceiver(input_format='i16'): the
    zero-host-conversion pipeline must produce the same audio as the
    converting path (round-3 ingest perf feature)."""
    raw = _am_bytes(3 * BLOCK)
    want = []
    rt_c = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK))
    rt_c.push(raw)
    rt_c.stop(drain=True)
    want = np.concatenate(list(iter(rt_c)))

    from tpudsp.chains.am import AMReceiver as _AMR
    rt_i = StreamRuntime(_AMR(AMConfig(), block_len=BLOCK,
                              input_format="i16"),
                         sample_format="int16_raw")
    rt_i.push(raw)
    rt_i.stop(drain=True)
    got = np.concatenate(list(iter(rt_i)))
    assert got.shape == want.shape
    err = np.abs(got - want).max()
    assert err < 1e-6 * max(1.0, np.abs(want).max()) + 1e-7, err


def test_stream_runtime_raw_u8_passthrough_matches_converted():
    """sample_format='uint8_raw' + AMReceiver(input_format='u8'): the
    RTL-SDR zero-host-conversion pipeline must match the converting
    'uint8' path (which feeds the c64 chain u8_to_iq samples)."""
    n = 3 * BLOCK
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1000.0 / 2e6 * t)
    iq = (1.0 + 0.5 * msg) * 0.3 * np.exp(2j * np.pi * 200.0 / 2e6 * t)
    xs = np.empty(2 * n, np.uint8)
    xs[0::2] = np.clip(np.round(iq.real * 127.5 * 0.9 + 127.5), 0, 255)
    xs[1::2] = np.clip(np.round(iq.imag * 127.5 * 0.9 + 127.5), 0, 255)
    raw = xs.tobytes()

    rt_c = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK),
                         sample_format="uint8")
    rt_c.push(raw)
    rt_c.stop(drain=True)
    want = np.concatenate(list(iter(rt_c)))

    rt_u = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK,
                                    input_format="u8"),
                         sample_format="uint8_raw")
    rt_u.push(raw)
    rt_u.stop(drain=True)
    got = np.concatenate(list(iter(rt_u)))
    assert got.shape == want.shape
    # block 0 carries the documented half-LSB u8 tail-init transient
    w, g = want[300:], got[300:]
    err = np.abs(g - w).max()
    assert err < 1e-5 * max(1.0, np.abs(w).max()), err


def test_stream_runtime_drives_sharded_scanner_from_wire_bytes():
    """Integration: StreamRuntime('uint8_raw') pumping raw RTL-SDR bytes
    through the TIME-SHARDED scanner (8-shard CPU mesh) — the full
    production story: wire bytes -> SPSC ring -> sharded jitted step ->
    audio queue, with per-block metrics meta."""
    from tpudsp.chains.channelizer import (ChannelizedBankConfig,
                                           ChannelizerConfig)
    from tpudsp.parallel import make_mesh
    from tpudsp.parallel.multihost import ShardedScanner

    C = 32
    fs = 3_200_000.0
    cfg = ChannelizedBankConfig(
        channelizer=ChannelizerConfig(nchan=C, taps_per_branch=6,
                                      iq_rate=fs),
        demod="fm", kd=0.25)
    n = C * 2048
    sc = ShardedScanner(cfg, make_mesh(1, 8), block_len=n,
                        input_format="u8")

    t = np.arange(2 * n)
    x = 0.4 * np.exp(1j * (2 * np.pi * (5 / C) * t
                           + 2 * np.pi * 0.03 / C * np.cumsum(
                               np.sin(2 * np.pi * 0.001 * t))))
    wire = np.empty(2 * len(t), np.uint8)
    wire[0::2] = np.clip(np.round(x.real * 127.5 + 127.5), 0, 255)
    wire[1::2] = np.clip(np.round(x.imag * 127.5 + 127.5), 0, 255)

    blocks = []
    rt = StreamRuntime(sc, sample_format="uint8_raw",
                       on_audio=lambda a, meta: blocks.append(np.asarray(a)))
    rt.push(wire.tobytes())
    rt.stop(drain=True)
    assert rt.blocks_processed == 2
    audio = np.concatenate(blocks, axis=1)
    ch5 = audio[5, audio.shape[1] // 2:]
    spec = np.abs(np.fft.rfft((ch5 - ch5.mean()) * np.hanning(len(ch5))))
    peak = np.fft.rfftfreq(len(ch5), C / fs)[np.argmax(spec)]
    assert abs(peak - 0.001 * fs) < 0.02 * fs / C, peak
    assert np.isfinite(audio).all()


def test_stream_runtime_stereo_wire_format():
    """WBFM stereo chain fed raw RTL-SDR bytes through the runtime
    ('uint8_raw' + input_format='u8'): (M, 2) PCM comes out and matches
    serial block calls on the same wire bytes exactly."""
    import numpy as np
    from tpudsp.chains.wbfm import WBFMStereoReceiver
    from tpudsp.io import StreamRuntime

    n = 100_000
    fs = 2_400_000.0
    t = np.arange(2 * n)
    f_p = 19000.0 / fs
    comp = (np.sin(2 * np.pi * 700.0 / fs * t)
            + 0.1 * np.cos(2 * np.pi * f_p * t)) * 0.008
    x = np.exp(1j * 2 * np.pi * np.cumsum(comp) * 4.0).astype(np.complex64)
    wire = np.clip(np.round(np.stack([x.real, x.imag], axis=1)
                            * 127.5 + 127.5), 0, 255).astype(np.uint8)

    rx = WBFMStereoReceiver(block_len=n, input_format="u8")
    rt = StreamRuntime(rx, sample_format="uint8_raw")
    rt.push(wire.tobytes())
    rt.stop(drain=True)
    streamed = np.concatenate(list(rt), axis=0)

    rx2 = WBFMStereoReceiver(block_len=n, input_format="u8")
    serial = np.concatenate(
        [np.asarray(rx2(wire[:n])), np.asarray(rx2(wire[n:]))], axis=0)
    assert streamed.shape == serial.shape
    assert streamed.shape[1] == 2
    assert np.array_equal(streamed, serial)


def test_stream_runtime_drain_pop_push_race_deterministic():
    """Regression (round 5): a pop_block whose ring read STARTS before a
    concurrent push's write returns None; stop() then sets _stopping and
    the pump must NOT exit on that stale None -- the drain barrier does
    one fresh pop after observing _stopping. Simulated deterministically:
    the first pop returns None regardless of ring content."""
    raw = _am_bytes(2 * BLOCK)
    seen = []
    rt = StreamRuntime(AMReceiver(AMConfig(), block_len=BLOCK),
                       on_audio=lambda a, meta: seen.append(meta["block"]))
    # pause the pump on a fence so the raced pop provably happens after
    # push: pop #1 waits for the push, then reports None (the race)
    pushed = threading.Event()
    real_pop = rt._stream.pop_block
    calls = []

    def raced_pop():
        calls.append(None)
        if len(calls) == 1:
            pushed.wait(timeout=5.0)
            return None  # ring read raced the concurrent write
        return real_pop()

    rt._stream.pop_block = raced_pop
    rt.push(raw)
    pushed.set()
    rt.stop(drain=True)
    assert seen == [0, 1], f"drain dropped blocks: {seen}"


def test_stream_runtime_drain_under_load():
    """Probabilistic twin of the deterministic race test: tight
    push-then-stop iterations under scheduler pressure (the original
    witness was 1-in-20 under full-suite load)."""
    raw = _am_bytes(2 * BLOCK)
    rx = AMReceiver(AMConfig(), block_len=BLOCK)
    stop_burn = threading.Event()

    def burner():
        x = 1.0
        while not stop_burn.is_set():
            x = x * 1.0000001 + 1e-9

    burners = [threading.Thread(target=burner, daemon=True)
               for _ in range(4)]
    for b in burners:
        b.start()
    try:
        for i in range(30):
            seen = []
            rt = StreamRuntime(rx, on_audio=lambda a, m: seen.append(
                m["block"]))
            rt.push(raw)
            rt.stop(drain=True)
            assert seen == [0, 1], f"iter {i}: drain dropped blocks {seen}"
    finally:
        stop_burn.set()
