"""Shared test helpers: SNR metric and signal synthesis."""

import numpy as np


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of `test` against reference `ref` in dB (BASELINE.md acceptance
    metric: >= 60 dB)."""
    ref = np.asarray(ref, dtype=np.complex128 if np.iscomplexobj(ref) else np.float64)
    test = np.asarray(test, dtype=ref.dtype)
    err = ref - test
    p_sig = np.mean(np.abs(ref) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    if p_err == 0:
        return np.inf
    if p_sig == 0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_err)


def tones(n, freqs, amps=None, phases=None, complex_out=True, seed=None):
    """Sum of tones at `freqs` (cycles/sample)."""
    rng = np.random.default_rng(seed)
    freqs = np.atleast_1d(freqs)
    if amps is None:
        amps = np.ones_like(freqs, dtype=float)
    if phases is None:
        phases = rng.uniform(0, 2 * np.pi, len(freqs)) if seed is not None else np.zeros(len(freqs))
    t = np.arange(n)
    if complex_out:
        x = sum(a * np.exp(2j * np.pi * f * t + 1j * p) for f, a, p in zip(freqs, amps, phases))
        return np.asarray(x, dtype=np.complex128)
    x = sum(a * np.cos(2 * np.pi * f * t + p) for f, a, p in zip(freqs, amps, phases))
    return np.asarray(x, dtype=np.float64)


def noise(n, scale=1.0, complex_out=True, seed=0):
    rng = np.random.default_rng(seed)
    if complex_out:
        return scale * (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    return scale * rng.standard_normal(n)
