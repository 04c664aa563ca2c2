"""Elastic recovery (SURVEY.md section 5): kill the chain mid-stream,
rebuild + resume from the snapshot, output must continue exactly."""

import os

import numpy as np

from tpudsp.chains import AMConfig, AMReceiver, BankConfig, ReceiverBank
from tpudsp.parallel.elastic import ElasticRunner
from tests.util import noise


def test_elastic_resume_exact(tmp_path):
    n_blk = 125_000
    blocks = [noise(n_blk, complex_out=True, seed=i).astype(np.complex64)
              for i in range(8)]
    cfg = AMConfig()
    make = lambda: AMReceiver(cfg, block_len=n_blk, plan="fused", exact=True)

    # ground truth: uninterrupted stream
    rx = make()
    truth = [np.asarray(rx(b)) for b in blocks]

    path = os.path.join(tmp_path, "am")
    runner = ElasticRunner(make, path, snapshot_every=2)
    out = []
    for i, b in enumerate(blocks):
        if i == 5:
            # simulate a crash: blow away the runner (as if the process or
            # device died), then reconstruct from the snapshot
            del runner
            runner = ElasticRunner(make, path, snapshot_every=2)
            i0 = runner.block_index
            assert i0 == 4  # snapshots at blocks 2 and 4
            out = out[:i0]
            for j in range(i0, i):
                out.append(runner(blocks[j]))
        out.append(runner(b))
    for t, o in zip(truth, out):
        np.testing.assert_array_equal(t, o)


def test_mixed_demod_bank():
    """EP-analog: one bank with per-channel FM and AM demods."""
    iq_rate = 2_400_000.0
    n = 500_000
    t = np.arange(n)
    f_fm, f_am = 300_000.0, -500_000.0
    m1 = np.sin(2 * np.pi * 1000.0 / iq_rate * t)
    m2 = np.sin(2 * np.pi * 2000.0 / iq_rate * t)
    s_fm = np.exp(1j * (2 * np.pi * f_fm / iq_rate * t
                        + 2 * np.pi * 0.03125 * np.cumsum(m1)))
    s_am = (1 + 0.5 * m2) * np.exp(2j * np.pi * f_am / iq_rate * t)
    iq = (0.5 * (s_fm + s_am)).astype(np.complex64)
    cfg = BankConfig(freqs=(f_fm, f_am), iq_rate=iq_rate,
                     demod=("fm", "am"), kd=0.3125)
    bank = ReceiverBank(cfg, block_len=n)
    audio = np.asarray(bank(iq))
    fs_a = cfg.audio_rate
    for c, f_msg in ((0, 1000.0), (1, 2000.0)):
        tail = audio[c, audio.shape[1] // 4:]
        tail = tail - tail.mean()
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / fs_a)
        peak = freqs[np.argmax(spec[3:]) + 3]
        assert abs(peak - f_msg) < 40.0, (c, peak)
