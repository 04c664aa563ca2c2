"""Squelch as a CHAIN/runtime capability (round-2 VERDICT missing #4).

The reference's documented L4 pattern is squelch gating inside the AGC
with a mid-loop Python callback on squelch open (agc.hpp:109-128,
agc_docs.cpp:93-97). Here squelch is a chain config: gated regions emit
zeroed audio, the per-sample FSM tensor rides BlockMetrics, and
StreamRuntime delivers rise/fall events host-side between blocks."""

import numpy as np
import pytest

from tpudsp.chains import AMConfig, AMReceiver, BankConfig, ReceiverBank
from tpudsp.chains.metrics import squelch_events
from tpudsp.kernels import agc as kagc

FS = 2_000_000.0


def _bursty_iq(n, burst_from, amp=0.3, quiet=1e-3, seed=0):
    """Quiet noise, then an AM carrier burst from sample `burst_from`."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1000.0 / FS * t)
    x = (quiet * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    burst = ((1 + 0.5 * msg) * amp
             * np.exp(2j * np.pi * 200.0 / FS * t)).astype(np.complex64)
    x[burst_from:] += burst[burst_from:]
    return x


def test_am_chain_squelch_gates_audio_and_fires_rise():
    n = 250_000
    cfg = AMConfig(squelch=True, squelch_threshold=-30.0)
    rx = AMReceiver(cfg, block_len=n)
    burst_from = n // 2
    audio = np.asarray(rx(_bursty_iq(n, burst_from)))
    modes = np.asarray(rx.metrics.squelch_modes)
    n_out = rx.n_out
    burst_out = burst_from * n_out // n

    # gated region: audio zeroed at the squelch (downstream linear
    # filters ring out their cold-start transient, as in the reference
    # where the AGC zeroes its own output and the deemph/DC stages still
    # carry memory -- agc.hpp:113-118)
    settle = 1000
    assert np.abs(audio[settle:burst_out - 10]).max() < 1e-5
    # the burst opens the squelch: audio passes shortly after burst_out
    assert np.abs(audio[burst_out + 500:]).max() > 1e-3

    events = squelch_events(modes)
    rises = [e for e in events if e["kind"] == "rise"]
    # exactly one rise once the AGC has settled (the g=1 cold start may
    # legitimately produce one rise/fall pair at t~0 while rssi crosses
    # down through the threshold)
    late_rises = [e for e in rises if e["sample"] > settle]
    assert len(late_rises) == 1, events
    # ... at the burst onset, within the AGC's response time
    assert burst_out <= late_rises[0]["sample"] < burst_out + 400
    assert late_rises[0]["channel"] is None
    # FSM sits in SIGNALHI for the rest of the burst
    assert (modes[late_rises[0]["sample"] + 1:] == kagc.SQ_SIGNALHI).all()


def test_am_chain_squelch_closes_after_timeout():
    """Burst ends mid-block: FALL fires, SIGNALLO counts down `timeout`
    samples of gated-but-pending audio, then the squelch re-arms."""
    n = 250_000
    timeout = 50
    cfg = AMConfig(squelch=True, squelch_threshold=-30.0,
                   squelch_timeout=timeout)
    rx = AMReceiver(cfg, block_len=n)
    x = _bursty_iq(n, 0)            # burst on from the start
    x[n // 2:] *= 1e-3 / 0.3        # ...and collapses at midblock
    audio = np.asarray(rx(x))
    modes = np.asarray(rx.metrics.squelch_modes)
    n_out = rx.n_out
    off_out = (n // 2) * n_out // n

    events = squelch_events(modes)
    falls = [e for e in events if e["kind"] == "fall"
             and e["sample"] > off_out]
    assert falls, events
    fall_at = falls[0]["sample"]
    # the AGC re-tracks the quiet level within its loop memory
    assert off_out <= fall_at < off_out + 600
    # SIGNALLO countdown: exactly `timeout` samples, then ENABLED
    lo = modes[fall_at + 1:fall_at + 1 + timeout]
    assert (lo == kagc.SQ_SIGNALLO).all()
    assert modes[fall_at + 1 + timeout] == kagc.SQ_TIMEOUT
    assert (modes[fall_at + 2 + timeout:] == kagc.SQ_ENABLED).all()
    # audio is gated from the fall onward: the PROGRAM content (1 kHz
    # message) vanishes; what remains is the slow DC-tracker memory
    # ringing down (the classic squelch thump -- the reference's deemph/
    # DC-blocker stages ring identically after its AGC zeroes its output)
    def tone_power(seg):
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.fft.rfftfreq(len(seg), 1 / 48_000.0)
        i = np.argmin(np.abs(f - 1000.0))
        return spec[i - 2:i + 3].max() ** 2

    active = audio[off_out // 2:off_out - 100]
    gated = audio[-len(active):]
    assert tone_power(gated) < 1e-4 * tone_power(active)
    # and the residual itself is decaying, not program audio
    just_after = np.abs(audio[fall_at + 200:fall_at + 400]).mean()
    tail_level = np.abs(audio[-200:]).mean()
    assert tail_level < 0.5 * just_after


def test_bank_coherent_squelch_per_channel():
    """Two coherent-AM channels, one active: the quiet channel's audio is
    gated to zero and events carry the channel index."""
    fs = 2_400_000.0
    n = 1_000_000
    cfg = BankConfig(freqs=(-500_000.0, 400_000.0), iq_rate=fs, demod="am",
                     am_coherent=True, squelch=True,
                     squelch_threshold=-40.0)
    bank = ReceiverBank(cfg, block_len=n)
    t = np.arange(n)
    msg = np.sin(2 * np.pi * 1200.0 / fs * t)
    iq = ((1 + 0.5 * msg) * 0.4
          * np.exp(2j * np.pi * 400_000.0 / fs * t)).astype(np.complex64)
    audio = np.asarray(bank(iq))
    modes = np.asarray(bank.metrics.squelch_modes)
    assert modes.shape[0] == 2

    # channel 1 (active) opens; channel 0 (empty) stays gated
    settle = 2000
    assert (modes[1, settle:] == kagc.SQ_SIGNALHI).all()
    assert (modes[0, settle:] == kagc.SQ_ENABLED).all()
    assert np.abs(audio[0, settle // cfg.decim2:]).max() < 1e-5
    assert np.abs(audio[1, audio.shape[1] // 2:]).max() > 0.01

    events = squelch_events(modes)
    rises = [e for e in events if e["kind"] == "rise"]
    assert rises and all(e["channel"] == 1 for e in rises
                         if e["sample"] > settle)


def test_stream_runtime_on_event_delivers_squelch_events():
    """StreamRuntime(on_event=...): the reference's onRise pattern as
    events-become-data -- a bursty stream fires exactly the expected rise
    through the runtime, tagged with its block index."""
    from tpudsp.io import StreamRuntime

    n = 250_000
    cfg = AMConfig(squelch=True, squelch_threshold=-30.0)
    # block 0: quiet; block 1: burst -> one rise in block 1
    quiet = _bursty_iq(n, n)        # never bursts
    burst = _bursty_iq(n, 0)        # burst throughout
    raw = np.empty(2 * 2 * n, np.int16)
    iq = np.concatenate([quiet, burst])
    raw[0::2] = np.round(iq.real * 32767 * 0.5)
    raw[1::2] = np.round(iq.imag * 32767 * 0.5)

    events = []
    rt = StreamRuntime(AMReceiver(cfg, block_len=n),
                       on_event=events.append)
    rt.push(raw.tobytes())
    rt.stop(drain=True)
    list(iter(rt))
    assert rt.blocks_processed == 2

    # exactly one rise outside the g=1 cold start (block 0 sample ~0
    # legitimately dithers once while rssi crosses down): the block-1
    # burst onset, within the AGC's response time
    rises = [e for e in events
             if e["kind"] == "rise" and not (e["block"] == 0
                                             and e["sample"] < 10)]
    assert len(rises) == 1, events
    assert rises[0]["block"] == 1
    assert rises[0]["sample"] < 500
