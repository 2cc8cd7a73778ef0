"""Portable Bloom filter: no false negatives ever, FP rate bounded, and
the bitmap layout is reproducible (63-bit words, salted-md5 positions)."""

import pyspark.sql.functions as F

from gravity_spark.functions.bloom import bloom_build, bloom_might_contain


def test_no_false_negatives(spark):
    vals = spark.createDataFrame([(f"v{i}",) for i in range(300)], "x string")
    bloom = bloom_build(vals, "x", m=4096, k=3)
    probed = bloom_might_contain(
        vals.withColumn("rid", F.monotonically_increasing_id()),
        "x", bloom, m=4096, k=3, id_col="rid",
    )
    assert all(r.bloom_hit for r in probed.collect())


def test_false_positive_rate_bounded(spark):
    member = spark.createDataFrame([(f"in{i}",) for i in range(200)], "x string")
    outside = spark.createDataFrame([(i, f"out{i}") for i in range(2000)], "rid long, x string")
    bloom = bloom_build(member, "x", m=8192, k=3)
    probed = bloom_might_contain(outside, "x", bloom, m=8192, k=3, id_col="rid")
    fps = sum(r.bloom_hit for r in probed.collect())
    # 600 of 8192 bits set -> FP ~ (0.073)^3 ~ 4e-4; allow generous slack
    assert fps < 20


def test_bitmap_word_layout(spark):
    vals = spark.createDataFrame([("a",), ("b",)], "x string")
    rows = bloom_build(vals, "x", m=4096, k=3).collect()
    assert all(0 <= r.word_idx <= 4096 // 63 for r in rows)
    assert all(r.bits > 0 for r in rows)  # 63-bit words: sign bit never set
