"""Utility subpackage: native bindings, checkpointing, profiling."""

from . import checkpoint, native, profiling  # noqa: F401
