"""blink_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query semantics of the reference (dhdhagar/BLINK /
ArboEL: bi-encoder retrieve -> cross-encoder rerank -> graph
clustering; see /root/reference/README.md) as an idiomatic Spark
dataflow over a table of source-code files:

  stage 1  blocking            (lang + MinHash-LSH bands over content shingles)
  stage 2  pair scoring        (Jaro-Winkler / token Jaccard / hashed-TF cosine)
  stage 3  transitive cluster  (iterative connected components via self-joins)

Everything is DataFrame/SQL-first; Python appears only in Arrow-
vectorized pandas UDFs (MinHash permutations, Jaro-Winkler batches).
"""

__version__ = "0.1.0"

from blink_spark.session import get_spark  # noqa: F401
