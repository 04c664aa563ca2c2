"""Observability and helpers."""

from .hostbuild import host_build
from .profiling import annotate, stage_report, trace

__all__ = ["annotate", "host_build", "stage_report", "trace"]
