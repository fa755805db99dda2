"""Structured Streaming twin of the incremental batch path (SURVEY
§2.8 — a capability extension; the reference itself is weekly
micro-batch)."""
