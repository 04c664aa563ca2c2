"""Observability and helpers."""

from .profiling import annotate, stage_report, trace

__all__ = ["annotate", "stage_report", "trace"]
