"""Hand-written Pallas TPU kernels for the hot paths XLA doesn't already
saturate. Each kernel has an XLA-path twin in tpudsp/kernels pinned by
equivalence tests (interpret mode on CPU; compiled on TPU)."""

import jax


def enabled() -> bool:
    """True when a TPU backend is active (Pallas kernels compiled natively)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


from .agc_scan import agc_chunked_pallas  # noqa: E402,F401

__all__ = ["agc_chunked_pallas", "enabled"]
