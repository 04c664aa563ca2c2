"""IO layer tests: native byte conversion + SPSC stream framing + WAV."""

import threading
import wave

import numpy as np
import pytest

from tpudsp.io import IQStream, WavSink, bytes_to_iq, u8_to_iq, write_wav


def test_bytes_to_iq_matches_reference_semantics():
    raw = np.array([32767, 0, 0, -32767, 16384, -16384, 123, 456],
                   dtype=np.int16).tobytes()
    iq = bytes_to_iq(raw)
    assert iq.dtype == np.complex64
    ref = np.array([1.0, -1.0j, 0.5 - 0.5j, (123 + 456j) / 32767.0],
                   dtype=np.complex64)
    np.testing.assert_allclose(iq, ref, atol=1e-4)
    assert len(bytes_to_iq(raw + b"\x00")) == 4  # partial pair dropped


def test_u8_to_iq():
    raw = bytes([255, 0, 127, 128])
    iq = u8_to_iq(raw)
    np.testing.assert_allclose(iq.real, [1.0, -0.0039216], atol=1e-3)
    np.testing.assert_allclose(iq.imag, [-1.0, 0.0039216], atol=1e-3)


def test_iqstream_block_framing():
    s = IQStream(block_len=100, capacity_blocks=4)
    assert s.pop_block() is None
    data = np.arange(250 * 2, dtype=np.int16).tobytes()  # 250 IQ pairs
    s.push(data)
    b1 = s.pop_block()
    b2 = s.pop_block()
    assert b1 is not None and b2 is not None and s.pop_block() is None
    full = bytes_to_iq(data)
    np.testing.assert_array_equal(b1, full[:100])
    np.testing.assert_array_equal(b2, full[100:200])
    assert s.pending_bytes == 50 * 4


def test_iqstream_overflow_drops_whole_writes():
    s = IQStream(block_len=10, capacity_blocks=2)
    blk = b"\x00" * (10 * 4)
    wrote = sum(s.push(blk) for _ in range(5))
    assert wrote <= 2 * 10 * 4 + 10 * 4  # capacity rounded up to pow2
    assert s.dropped > 0


def test_iqstream_threaded_producer():
    s = IQStream(block_len=256, capacity_blocks=32)
    n_blocks = 64
    payload = np.random.default_rng(0).integers(
        -1000, 1000, size=n_blocks * 256 * 2, dtype=np.int16).tobytes()

    def producer():
        step = 256 * 4
        for i in range(0, len(payload), step):
            while s.push(payload[i:i + step]) == 0:
                pass

    th = threading.Thread(target=producer)
    th.start()
    got = []
    while len(got) < n_blocks:
        b = s.pop_block()
        if b is not None:
            got.append(b)
    th.join()
    np.testing.assert_array_equal(np.concatenate(got), bytes_to_iq(payload))


def test_write_wav_roundtrip_mono_and_stereo(tmp_path):
    rate = 48_000
    t = np.arange(4800, dtype=np.float32)
    mono = (0.5 * np.sin(2 * np.pi * 440 / rate * t)).astype(np.float32)
    p = str(tmp_path / "m.wav")
    write_wav(p, mono, rate)
    with wave.open(p) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (1, rate, 2)
        back = np.frombuffer(w.readframes(w.getnframes()), "<i2") / 32767.0
    np.testing.assert_allclose(back, mono, atol=1 / 32767)

    stereo = np.stack([mono, -mono], axis=1)  # FMStereo-style (N, 2)
    p2 = str(tmp_path / "s.wav")
    write_wav(p2, stereo, rate)
    with wave.open(p2) as w:
        assert w.getnchannels() == 2
        back = np.frombuffer(w.readframes(w.getnframes()), "<i2"
                             ).reshape(-1, 2) / 32767.0
    np.testing.assert_allclose(back, stereo, atol=1 / 32767)


def test_wav_sink_streaming_matches_one_shot(tmp_path):
    rate = 48_000
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(10_000) * 0.2).astype(np.float32)
    p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(p1, pcm, rate)
    with WavSink(p2, rate) as sink:
        for i in range(0, len(pcm), 1337):
            sink(pcm[i:i + 1337])
    assert sink.frames_written == len(pcm)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_wav_sink_infers_stereo_and_validates_channels(tmp_path):
    # ADVICE r2 low / VERDICT weak #3: the default sink must not flatten
    # FMStereo's (N, 2) blocks under a mono header.
    rate = 48_000
    t = np.arange(4800, dtype=np.float32)
    mono = (0.4 * np.sin(2 * np.pi * 440 / rate * t)).astype(np.float32)
    stereo = np.stack([mono, -mono], axis=1)

    p = str(tmp_path / "s.wav")
    with WavSink(p, rate) as sink:  # channels inferred from first block
        sink(stereo[:1000])
        sink(stereo[1000:])
    assert sink.frames_written == len(stereo)
    with wave.open(p) as w:
        assert w.getnchannels() == 2
        back = np.frombuffer(w.readframes(w.getnframes()), "<i2"
                             ).reshape(-1, 2) / 32767.0
    np.testing.assert_allclose(back, stereo, atol=1 / 32767)

    # explicit channel count disagreeing with the data is an error
    with WavSink(str(tmp_path / "bad.wav"), rate, channels=1) as sink:
        with pytest.raises(ValueError, match="channel"):
            sink(stereo)
    # channel count changing mid-stream is an error
    with WavSink(str(tmp_path / "bad2.wav"), rate) as sink:
        sink(stereo[:10])
        with pytest.raises(ValueError, match="channel"):
            sink(mono[:10])
    # a sink that never saw a block still closes to a valid empty file
    with WavSink(str(tmp_path / "empty.wav"), rate):
        pass
    with wave.open(str(tmp_path / "empty.wav")) as w:
        assert w.getnframes() == 0
