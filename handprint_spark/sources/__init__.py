"""Table sources/sinks and the checkpoint/lineage resume protocol."""
