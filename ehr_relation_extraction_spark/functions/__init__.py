"""Pure-Python kernels + vectorized column helpers.

The kernels here are deliberately dependency-free (no Spark imports) so
they can be reused three ways:

1. inside Arrow ``mapInPandas`` stages on executors,
2. by the driver-side pure-Python oracle (tests),
3. by unit tests with hand-computed expectations.
"""
