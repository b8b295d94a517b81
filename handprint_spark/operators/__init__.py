"""DataFrame-level operators of the extraction engine."""
