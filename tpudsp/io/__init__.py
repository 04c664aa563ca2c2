"""IQ ingest, block framing, and state checkpointing."""

from .ingest import IQStream, bytes_to_iq, u8_to_iq

__all__ = ["IQStream", "bytes_to_iq", "u8_to_iq"]
