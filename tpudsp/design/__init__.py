"""Host-side float64 filter design (runs once at construction; SURVEY.md 3.2)."""

from . import firdes, iirdes  # noqa: F401
