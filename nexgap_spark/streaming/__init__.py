"""Structured Streaming twins of the reference's hand-rolled streaming
concerns (SURVEY §2.11 T1-T6): watermarked windowed aggregation, session
windows, incremental append sinks, and stateful processing."""
