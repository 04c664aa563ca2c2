"""IQ ingest, block framing, streaming runtime, and state checkpointing."""

from .ingest import IQStream, bytes_to_iq, u8_to_iq
from .stream import StreamRuntime

__all__ = ["IQStream", "StreamRuntime", "bytes_to_iq", "u8_to_iq"]
