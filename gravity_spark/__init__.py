"""gravity_spark — a PySpark-native data replication + analytics engine.

A from-scratch rebuild of the capabilities of moiot/gravity (a Go CDC
replication engine) on Apache Spark:

- CDC change-event envelope as a DataFrame contract (core.envelope)
- matcher/filter chain as Catalyst Column expressions (core.matchers,
  operators.filters)
- per-key ordered upsert ("scheduler" + SQL engines) as last-write-wins
  collapse + merge (operators.collapse, operators.upsert)
- batch snapshot / stream / two-stage replication sources (sources.*)
- Kafka/ES/stdout wire-format sinks (sinks.*)
- plus the large-scale training-data operators the reference lacks:
  dedup, similarity search, text analysis, multimodal plumbing
  (functions.*)

Everything is DataFrame-first: operators are functions
``DataFrame -> DataFrame`` so Catalyst can optimize the composed plan.
"""

__version__ = "0.1.0"

from gravity_spark.session import get_spark  # noqa: F401
