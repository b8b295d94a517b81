"""handprint_spark — a PySpark-native document-extraction analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
caltechlibrary/handprint (reference surveyed in SURVEY.md): an
interleaved text+media document table
``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)`` is
processed by DataFrame operators plus vectorized pandas/Arrow UDFs —
image normalization, deterministic local HTR decode, per-service result
normalization, reading-order reconstruction, ground-truth comparison —
alongside the large-scale training-data operators (dedup families,
similarity search, text analysis) that a 100 TB corpus pipeline needs.

Layout:
  kernels/    pure-Python batch kernels (no Spark import) called from UDFs
  operators/  DataFrame-level operators (extraction, dedup, similarity, ...)
  sources/    table readers/writers + checkpoint/lineage protocol
  plans/      partitioning / skew / broadcast helpers
  streaming/  Structured Streaming surface
"""

__version__ = "0.1.0"
