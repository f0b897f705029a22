"""Streaming execution: native Structured Streaming mode and custom
stateful operators (applyInPandasWithState)."""

from . import native, stateful  # noqa: F401
