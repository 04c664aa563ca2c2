"""Math helpers for Pallas TPU kernels.

The Mosaic TPU lowering has no atan2 primitive (KernelType.TC:
"Unimplemented primitive ... atan2"), so kernels that need phase angles
(PLL error terms) use the polynomial implementation shared with the XLA
demod paths — the canonical copy lives in kernels/fastmath.py (it is
also the fast CPU path: XLA:CPU's libm atan2 is ~28x slower); this
module re-exports it for the Pallas kernels' historical import site.
"""

from __future__ import annotations

from ..kernels.fastmath import _atan_unit, patan2  # noqa: F401
