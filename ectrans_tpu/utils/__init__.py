"""Utilities: tracing/timing (DR_HOOK + GSTATS analogue), grid-point
blocking (NPROMA layout), checksums."""

from .timing import gstats, gstats_report, hook, reset_gstats
from .blocking import blocked_to_fields, fields_to_blocked
from .checksum import field_checksum

__all__ = [
    "blocked_to_fields",
    "field_checksum",
    "fields_to_blocked",
    "gstats",
    "gstats_report",
    "hook",
    "reset_gstats",
]
