"""ape_dts_spark — a PySpark-native re-implementation of the capabilities of
apecloud/ape-dts (snapshot migration, CDC replication, data check/revise/review,
routing/filtering/transforms), plus DataFrame-native large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design: everything is a pure ``DataFrame -> DataFrame`` function so Catalyst can
optimize end-to-end (predicate pushdown, column pruning, broadcast joins, AQE).
The reference's single-process pipeline concurrency (queues, parallelizers) maps
onto Spark's own partitioning/shuffle machinery and is therefore not re-implemented
imperatively — see SURVEY.md §2.6/§4.
"""

__version__ = "0.1.0"

from ape_dts_spark.session import get_spark  # noqa: F401
