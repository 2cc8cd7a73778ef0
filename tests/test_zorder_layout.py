"""Write-path check for the Z-order layout: repartitionByRange on the
Morton key must produce files whose per-file (partkey, suppkey) zone
maps are dramatically tighter than a hash layout's — that tightness IS
the data-skipping win (a reader probing either column can prune most
files by footer min/max alone).
"""

from pyspark.sql import functions as F

from gravity_spark.queries import T, _zorder_terms


def _file_ranges(df, cols):
    """Per-output-file min/max of cols, via input_file_name on re-read."""
    per_file = df.groupBy(F.input_file_name().alias("f")).agg(
        *[m(c).alias(f"{m.__name__}_{c}") for c in cols for m in (F.min, F.max)]
    )
    return per_file.collect()


def _avg_span(rows, col):
    spans = [r[f"max_{col}"] - r[f"min_{col}"] for r in rows]
    return sum(spans) / len(spans)


def test_zorder_write_narrows_zone_maps(spark, sf_dir, tmp_path):
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms"))
    z = li.crossJoin(F.broadcast(mx)).withColumn(
        "zval",
        F.expr(
            _zorder_terms(
                "(l_partkey * 256) div (mp + 1)",
                "(l_suppkey * 256) div (ms + 1)",
                idiv="div",
            )
        ),
    ).select("l_partkey", "l_suppkey", "zval")

    n_files = 8
    zpath = str(tmp_path / "zordered")
    z.repartitionByRange(n_files, "zval").write.mode("overwrite").parquet(zpath)
    hpath = str(tmp_path / "hashed")
    # hash layout on the same key: placement without range clustering
    z.repartition(n_files, "zval").write.mode("overwrite").parquet(hpath)

    zr = _file_ranges(spark.read.parquet(zpath), ["l_partkey", "l_suppkey"])
    hr = _file_ranges(spark.read.parquet(hpath), ["l_partkey", "l_suppkey"])
    assert len(zr) >= n_files // 2  # range partitioner actually split

    # every file in the hash layout spans ~the whole key domain; the
    # z-ordered layout must shrink the average span on BOTH dimensions
    # at once (8 files = 3 leading Morton bits = roughly 2 pruning bits
    # for one dimension + 1 for the other — no single-column sort does
    # both). Thresholds are loose versions of those expectations.
    assert _avg_span(zr, "l_partkey") < 0.7 * _avg_span(hr, "l_partkey")
    assert _avg_span(zr, "l_suppkey") < 0.6 * _avg_span(hr, "l_suppkey")
