"""Structured Streaming: replay source, streaming decode pipeline,
stateful sessionization, idempotent sinks."""
