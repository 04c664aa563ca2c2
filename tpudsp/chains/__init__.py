"""Receiver-chain graphs (the reference's L4 usage patterns as first-class,
single-jit pipelines): AM (BASELINE config 1), WBFM mono/stereo (config 2),
multi-channel banks (config 3+)."""

from .am import AMConfig, AMReceiver, am_step_composed, am_step_fused, build as am_build
from .bank import BankConfig, ReceiverBank, bank_step, build as bank_build
from .metrics import BlockMetrics, squelch_events
from .channelizer import (
    ChannelizedBank, ChannelizedBankConfig, Channelizer, ChannelizerConfig,
)
from .ssb import SSBConfig, SSBReceiver
from .wbfm import WBFMStereoReceiver, mono_receiver

__all__ = [
    "AMConfig", "AMReceiver", "am_step_composed", "am_step_fused", "am_build",
    "BankConfig", "BlockMetrics", "ReceiverBank", "bank_step", "bank_build",
    "ChannelizedBank", "ChannelizedBankConfig", "Channelizer",
    "ChannelizerConfig", "SSBConfig", "SSBReceiver", "WBFMStereoReceiver",
    "mono_receiver", "squelch_events",
]
