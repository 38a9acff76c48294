"""Utilities: debug/invariant-checking driver and structured tracing."""

from .debug import (
    DebugReport,
    InvariantViolation,
    IterationRecord,
    run_simplex_debug,
)

__all__ = [
    "run_simplex_debug",
    "DebugReport",
    "IterationRecord",
    "InvariantViolation",
]
