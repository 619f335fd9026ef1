"""simplir_spark — a from-scratch PySpark-native full-text indexing and
BM25 retrieval engine with the capabilities of the bgamari/simplir IR
toolbox (reference at /root/reference, Haskell).

Not a port: the reference's pipes-streaming execution engine is replaced by
Spark DataFrames, Arrow-vectorized UDFs, range partitioning and broadcast
joins.  See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"

from simplir_spark.session import get_spark  # noqa: F401
