"""Pure-NumPy vectorized kernels shared verbatim by the single-node oracle
and the distributed Spark engine (imported inside pandas/Arrow UDFs).

No Spark imports allowed anywhere in this subpackage — it must be usable
standalone for the oracle and golden-file generation, and importing pyspark
on executors' Python workers would be wasted weight.
"""
