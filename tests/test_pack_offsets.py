"""Property check: the two-level parallel prefix in pack_start_offsets
must equal the sequential per-source running sum for ANY input —
including shard boundaries, empty shards (sparse doc_ids), and
zero-token docs.
"""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from gravity_spark.queries import pack_start_offsets


def _sequential(d):
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))


def test_two_level_prefix_matches_sequential(spark):
    rng = random.Random(5)
    rows = []
    for src in ("a", "b", "c"):
        # sparse, shard-straddling ids (shard_docs=8 below -> many
        # boundaries, some empty shards), occasional zero-token docs
        ids = sorted(rng.sample(range(0, 500), 60))
        rows += [
            (src, i, 0 if rng.random() < 0.1 else rng.randrange(1, 50))
            for i in ids
        ]
    d = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")

    got = {
        (r["source"], r["doc_id"]): r["start_off"]
        for r in pack_start_offsets(d, shard_docs=8).collect()
    }
    want = {
        (r["source"], r["doc_id"]): r["start_off"]
        for r in _sequential(d).collect()
    }
    assert got == want
