"""Reference-compatible op surface: the 29 classes + 1 free function bound
by the reference's PYBIND11_MODULE (wrapper.cpp:10-273), re-implemented as
thin Python classes over jitted block-parallel kernels.
"""

from .agc_op import AGC
from .demod import AmpModem, BroadcastAM, FMStereo, FreqDem, SSBDemod
from .filters import (
    CBandpassIIR,
    CBandstopIIR,
    CHighpassIIR,
    CIIRFilter,
    CLowpassIIR,
    ComplexIIRFilter,
    DeemphasisFilter,
    RBandpassIIR,
    RBandstopIIR,
    RealDCBlocker,
    RealFIRFilter,
    RealIIRFilter,
    RealKaiserBessel,
    RHighpassIIR,
    RIIRFilter,
    RLowpassIIR,
)
from .nco_op import NCO
from .resample import ComplexResampler, CResampler, RealResampler, RResampler
from .util import Delay, HilbertTransform, bytes_to_iq

__all__ = [
    "AGC", "AmpModem", "BroadcastAM", "CBandpassIIR", "CBandstopIIR",
    "CHighpassIIR", "CIIRFilter", "CLowpassIIR", "ComplexIIRFilter",
    "ComplexResampler", "CResampler", "DeemphasisFilter", "Delay",
    "FMStereo", "FreqDem", "HilbertTransform", "NCO", "RBandpassIIR",
    "RBandstopIIR", "RealDCBlocker", "RealFIRFilter", "RealIIRFilter",
    "RealKaiserBessel", "RealResampler", "RHighpassIIR", "RIIRFilter",
    "RLowpassIIR", "RResampler", "SSBDemod", "bytes_to_iq",
]
