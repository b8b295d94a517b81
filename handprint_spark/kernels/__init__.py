"""Pure-Python kernels (no Spark imports).

These are the functions the pandas/Arrow UDFs call per batch, and the
functions pytest compares against the reference's goldens directly.
"""
