#!/usr/bin/env python
"""RTL-SDR multi-station scanner from RAW uint8 wire bytes.

The dongle's native stream is interleaved uint8 IQ ((b - 127.5)/127.5 —
standard RTL-SDR practice, matching tpudsp's own io.u8_to_iq; the
reference has no uint8 helper, its host-side bytes_to_iq is int16-only,
utility.hpp:61-69). Here NO host conversion happens at all: the bytes
flow through the native SPSC ring into the jitted bank as (N, 2) uint8,
and the affine conversion folds into the front-end matmul on-chip
(kernels/decimate.py strided_cfir_matmul_wide_u8) — 2 B/sample over
host->device and HBM instead of 8.

Run: python examples/rtl_scanner.py"""

import sys

import numpy as np

sys.path.insert(0, ".")
from tpudsp.chains import BankConfig, ReceiverBank  # noqa: E402
from tpudsp.io import StreamRuntime  # noqa: E402


def synth_wire_bytes(n, fs):
    """Three stations: FM at -600 kHz (1.2 kHz tone), AM at DC (800 Hz),
    FM at +500 kHz (2 kHz tone) — as RTL-SDR uint8 wire bytes."""
    t = np.arange(n)
    fm1 = 0.3 * np.exp(-2j * np.pi * 600e3 / fs * t
                       + 1j * (75e3 / 1.2e3) * 0.8
                       * np.sin(2 * np.pi * 1.2e3 / fs * t))
    am = 0.25 * (1 + 0.6 * np.sin(2 * np.pi * 800.0 / fs * t))
    fm2 = 0.3 * np.exp(2j * np.pi * 500e3 / fs * t
                       + 1j * (75e3 / 2e3) * 0.8
                       * np.sin(2 * np.pi * 2e3 / fs * t))
    x = fm1 + am + fm2
    wire = np.empty(2 * n, np.uint8)
    wire[0::2] = np.clip(np.round(x.real * 127.5 * 0.45 + 127.5), 0, 255)
    wire[1::2] = np.clip(np.round(x.imag * 127.5 * 0.45 + 127.5), 0, 255)
    return wire.tobytes()


def main():
    fs = 2_400_000.0
    cfg = BankConfig(freqs=(-600_000.0, 0.0, 500_000.0), iq_rate=fs,
                     demod=("fm", "am", "fm"), kd=75_000.0 / 240_000.0)
    block = 240_000
    n_blocks = 4
    raw = synth_wire_bytes(n_blocks * block, fs)

    bank = ReceiverBank(cfg, block_len=block, input_format="u8")
    blocks = []
    rt = StreamRuntime(bank, sample_format="uint8_raw",
                       on_audio=lambda a, meta: blocks.append(np.asarray(a)))
    # radio-callback-sized pushes (RTL-SDR default: 262144-byte buffers)
    for i in range(0, len(raw), 262144):
        rt.push(raw[i:i + 262144])
    rt.stop(drain=True)
    audio = np.concatenate(blocks, axis=1)

    fs_a = cfg.audio_rate
    names = ("FM -600k", "AM 0", "FM +500k")
    expect = (1200.0, 800.0, 2000.0)
    tail = audio[:, audio.shape[1] // 2:]
    ok = True
    for c, (name, f) in enumerate(zip(names, expect)):
        a = tail[c] - tail[c].mean()
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        peak = np.fft.rfftfreq(len(a), 1 / fs_a)[np.argmax(spec)]
        print(f"  {name}: tone {peak:7.1f} Hz (expect {f:.0f})")
        ok &= abs(peak - f) < 25.0
    print("bytes in:", len(raw), "-> audio", audio.shape,
          "| stats:", rt.stats)
    if not ok:
        raise SystemExit("station tone mismatch")
    print("RTL-SDR u8 wire-format scan: OK")


if __name__ == "__main__":
    main()
