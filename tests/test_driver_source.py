"""Driver-shaped streaming source (round-3 VERDICT missing #4): a mock
pyrtlsdr-contract driver feeding StreamRuntime through RadioSource, with
the three real-driver behaviors — variable-size callbacks, overflow, and
sample-rate drift — exercised end to end."""

import numpy as np
import pytest

from tpudsp.chains import BankConfig, ReceiverBank
from tpudsp.io import MockRTLSDRDriver, RadioSource, StreamRuntime

FS = 2_400_000.0
FREQS = (-600_000.0, 0.0, 500_000.0)


def _render(n0, n):
    """3-station scene: AM at 0, FM at +-; values within [-1, 1]."""
    t = (n0 + np.arange(n)) / FS
    m0 = np.sin(2 * np.pi * 900.0 * t)
    am = (1.0 + 0.5 * m0) * 0.25 * np.exp(2j * np.pi * 30.0 * t)
    fm1 = 0.25 * np.exp(1j * (2 * np.pi * FREQS[0] * t
                              + 3.0 * np.sin(2 * np.pi * 1100.0 * t)))
    fm2 = 0.25 * np.exp(1j * (2 * np.pi * FREQS[2] * t
                              + 3.0 * np.sin(2 * np.pi * 1500.0 * t)))
    return am + fm1 + fm2


def _bank():
    cfg = BankConfig(freqs=FREQS, iq_rate=FS, demod=("fm", "am", "fm"),
                     kd=75_000.0 / 240_000.0)
    return ReceiverBank(cfg, block_len=120_000, input_format="u8")


def test_mock_driver_end_to_end_matches_serial():
    """Variable-size driver chunks through the ring must produce exactly
    the audio of serial block calls on the same wire bytes (no drops:
    ample capacity)."""
    total = 480_000
    drv = MockRTLSDRDriver(_render, total, sample_rate=FS, variable=True)
    bank = _bank()
    rt = StreamRuntime(bank, sample_format="uint8_raw",
                       capacity_blocks=16)
    src = RadioSource(rt)
    src.run_async(drv, chunk_bytes=100_000)
    # wait for the mock stream to finish, then drain
    drv_done = []
    import time
    for _ in range(600):
        if src.bytes_delivered >= 2 * total:
            drv_done.append(True)
            break
        time.sleep(0.05)
    assert drv_done, "mock driver did not finish delivering"
    src.stop(drain=True)
    audio = list(rt)
    assert src.stats["overflow_chunks"] == 0
    assert src.stats["dropped_bytes"] == 0
    n_blocks = total // 120_000
    assert len(audio) == n_blocks
    streamed = np.concatenate(audio, axis=1)

    # serial reference on the identical wire bytes
    drv2 = MockRTLSDRDriver(_render, total, sample_rate=FS, variable=False)
    chunks = []
    drv2.read_bytes_async(lambda b, ctx: chunks.append(b),
                          num_bytes=2 * total)
    wire = b"".join(chunks)
    bank2 = _bank()
    blocks = []
    for k in range(n_blocks):
        w = np.frombuffer(wire[k * 240_000:(k + 1) * 240_000],
                          np.uint8).reshape(-1, 2)
        blocks.append(np.asarray(bank2(w)))
    serial = np.concatenate(blocks, axis=1)
    assert streamed.shape == serial.shape
    assert np.array_equal(streamed, serial)


def test_mock_driver_overflow_drops_whole_chunks():
    """A burst beyond the ring capacity must drop whole chunks (counted)
    and keep the stream frame-aligned — the audio that does come out is
    finite and the runtime keeps running."""
    total = 720_000
    drv = MockRTLSDRDriver(_render, total, sample_rate=FS, variable=True,
                           burst_chunks=10 ** 9)  # never pace: full burst
    bank = _bank()
    # tiny ring: 2 blocks worth
    rt = StreamRuntime(bank, sample_format="uint8_raw", capacity_blocks=2)
    src = RadioSource(rt)
    # deliver synchronously on this thread: the burst outruns the pump
    drv.read_bytes_async(src, num_bytes=100_000)
    src.stop(drain=True)
    audio = list(rt)
    st = src.stats
    assert st["overflow_chunks"] > 0
    assert st["overflow_bytes"] == st["dropped_bytes"]
    # whole-chunk drops: everything that came through is sane audio
    assert len(audio) >= 1
    for a in audio:
        assert np.isfinite(a).all()


def test_mock_driver_drift_keeps_tones():
    """+200 ppm crystal drift: the push pipeline neither stalls nor
    misframes; the AM channel still demodulates its 900 Hz message."""
    total = 480_000
    drv = MockRTLSDRDriver(_render, total, sample_rate=FS, variable=True,
                           drift_ppm=200.0, seed=3)
    bank = _bank()
    rt = StreamRuntime(bank, sample_format="uint8_raw", capacity_blocks=16)
    src = RadioSource(rt)
    drv.read_bytes_async(src, num_bytes=131072)  # synchronous full stream
    src.stop(drain=True)
    audio = np.concatenate(list(rt), axis=1)
    am = audio[1] - audio[1].mean()
    half = am[len(am) // 2:]
    S = np.abs(np.fft.rfft(half * np.hanning(len(half))))
    f = np.fft.rfftfreq(len(half), 50.0 / FS)  # decim1*decim2 = 50
    peak = f[np.argmax(S)]
    # 900 Hz within a couple of bins (drift shifts it by 0.02%)
    assert abs(peak - 900.0) < 25.0, peak


def test_radiosource_rejects_garbage():
    bank = _bank()
    rt = StreamRuntime(bank, sample_format="uint8_raw")
    src = RadioSource(rt)
    with pytest.raises(TypeError):
        src(3.14)
    src.stop(drain=False)


def test_radiosource_absorbs_push_after_stop():
    """A driver callback that fires after the runtime stopped must NOT
    raise into the driver thread: the chunk is counted dropped and the
    error is surfaced through .error/stats."""
    bank = _bank()
    rt = StreamRuntime(bank, sample_format="uint8_raw")
    src = RadioSource(rt)
    rt.stop(drain=False)
    got = src(b"\x7f" * 480)  # late delivery, absorbed
    assert got == 0
    assert src.error is not None
    assert src.stats["error"] is not None
    assert src.overflow_chunks == 1
