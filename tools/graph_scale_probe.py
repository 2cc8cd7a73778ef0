"""Graph-family scale probe: the measured numbers behind the 100 TB
claims for the iterative graph operators (the §6 dedup probe's sibling).

Replicates each query's own edge base N× with replica-disjoint vertex
ids (id + rep·OFFSET, OFFSET even so pk-parity splits are preserved) —
component/community structure replicates exactly, so rounds measure
diameter, not corpus size. Probes:

  components   — bipartite min-label propagation over the capped
                 customer↔part graph: base pass (even-pk edges), the
                 INCREMENTAL delta merge (odd-pk edges over touched
                 LABELS — graph_components_incremental's IVM shape),
                 and the one-shot full rebuild; reports rounds, shuffle
                 bytes, touched-label fraction and delta/rebuild ratio.
  lpa          — 3 synchronous label-propagation rounds over the
                 support-≥2 co-purchase graph (graph_label_propagation).
  pagerank     — 3 integer power-iteration rounds over the undirected
                 customer↔supplier graph (graph_pagerank_purchases).

Usage:
    python tools/graph_scale_probe.py [sf_dir] [mult [mult ...]]
    # default: /root/testdata/sf0.01 at 1, 10, 50
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F

from dedup_scale_probe import probe_session, shuffle_write_bytes

_OFF = 10_000_000  # even: preserves pk % 2 splits across replicas


def _replicate(df, cols, mult):
    if mult == 1:
        return df
    reps = df.sparkSession.range(mult).select(F.col("id").alias("rep"))
    out = df.crossJoin(reps)
    for c in cols:
        out = out.withColumn(c, F.col(c) + F.col("rep") * F.lit(_OFF))
    return out.drop("rep")


def _cp_edges(spark, sf_dir):
    """graph_components_incremental's capped customer↔part edge base."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    cp = (
        li.join(orders, "l_orderkey")
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    deg = cp.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
    return cp.join(F.broadcast(deg.filter(F.col("d") <= 60).select("pk")), "pk")


def probe_components(spark, sf_dir, mult) -> dict:
    from gravity_spark.functions.dedup import connected_components_bipartite

    kept = _replicate(_cp_edges(spark, sf_dir), ["ck", "pk"], mult).persist()
    n_edges = kept.count()
    out = {"edges": n_edges}
    verts = kept.select("ck").distinct()
    singleton = verts.select(
        F.col("ck").alias("doc_id"), F.lit(None).cast("string").alias("bucket")
    )

    # base pass: even-pk half
    base = kept.filter(F.col("pk") % 2 == 0).select(
        F.col("ck").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
    )
    st, sw0, t0 = {}, shuffle_write_bytes(spark), time.time()
    l1 = connected_components_bipartite(
        base.unionByName(singleton), stats=st
    ).select(F.col("doc_id").alias("ck"), F.col("component").alias("lab"))
    l1 = l1.localCheckpoint(eager=True)
    n_labels = l1.select("lab").distinct().count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    out["base"] = {
        "sec": round(t1 - t0, 2), "rounds": st.get("rounds"),
        "labels": n_labels,
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
    }

    # incremental delta: odd-pk half merged over touched LABELS
    delta = kept.filter(F.col("pk") % 2 == 1)
    st2, sw0, t0 = {}, shuffle_write_bytes(spark), time.time()
    dmemb = (
        delta.join(l1, "ck")
        .select(
            F.col("lab").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
        )
        .distinct()
        .persist()
    )
    touched = dmemb.select("doc_id").distinct().count()
    relabel = connected_components_bipartite(dmemb, stats=st2).select(
        F.col("doc_id").alias("lab"), F.col("component").alias("newlab")
    )
    merged = l1.join(F.broadcast(relabel), "lab", "left").select(
        "ck", F.coalesce("newlab", "lab").alias("component")
    )
    n_final = merged.select("component").distinct().count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    dmemb.unpersist()
    out["delta"] = {
        "sec": round(t1 - t0, 2), "rounds": st2.get("rounds"),
        "touched_labels": touched,
        "touched_frac": round(touched / max(n_labels, 1), 3),
        "final_components": n_final,
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
    }

    # one-shot rebuild over the full edge set (the alternative the
    # incremental path avoids)
    full = kept.select(
        F.col("ck").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
    )
    st3, sw0, t0 = {}, shuffle_write_bytes(spark), time.time()
    lf = connected_components_bipartite(full.unionByName(singleton), stats=st3)
    n_full = lf.select("component").distinct().count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    out["rebuild"] = {
        "sec": round(t1 - t0, 2), "rounds": st3.get("rounds"),
        "components": n_full,
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
    }
    out["delta_vs_rebuild"] = round(out["delta"]["sec"] / out["rebuild"]["sec"], 3)
    # convergence check: incremental must equal one-shot
    out["converged"] = bool(n_final == n_full)

    # realistic IVM cadence: base = 99 % of edges, delta = the ~1 %
    # with pk-hash % 97 == 0 (a daily CDC drip, not the query's 50/50
    # oracle split) — the shape behind "a daily edge delta touches a
    # vanishing fraction of the corpus"
    small = kept.filter((F.col("pk") % 97) == 0)
    big = kept.filter((F.col("pk") % 97) != 0).select(
        F.col("ck").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
    )
    st4 = {}
    lbase = connected_components_bipartite(
        big.unionByName(singleton), stats=st4
    ).select(F.col("doc_id").alias("ck"), F.col("component").alias("lab"))
    lbase = lbase.localCheckpoint(eager=True)
    n_delta_edges = small.count()
    sw0, t0 = shuffle_write_bytes(spark), time.time()
    dm = (
        small.join(lbase, "ck")
        .select(
            F.col("lab").alias("doc_id"), F.col("pk").cast("string").alias("bucket")
        )
        .distinct()
    )
    st5 = {}
    rl = connected_components_bipartite(dm, stats=st5).select(
        F.col("doc_id").alias("lab"), F.col("component").alias("newlab")
    )
    m2 = lbase.join(F.broadcast(rl), "lab", "left").select(
        "ck", F.coalesce("newlab", "lab").alias("component")
    )
    n2 = m2.select("component").distinct().count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    out["delta_1pct"] = {
        "delta_edges": n_delta_edges,
        "delta_edge_frac": round(n_delta_edges / max(n_edges, 1), 4),
        "sec": round(t1 - t0, 2), "rounds": st5.get("rounds"),
        "final_components": n2,
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
        "sec_vs_rebuild": round((t1 - t0) / out["rebuild"]["sec"], 3),
    }
    kept.unpersist()
    return out


def probe_lpa(spark, sf_dir, mult) -> dict:
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    e = _replicate(e0, ["u", "v"], mult)
    sym = (
        e.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(e.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint(eager=True)
    )
    n_edges = sym.count()
    labels = (
        sym.select(F.col("s").alias("lv")).distinct()
        .select("lv", F.col("lv").alias("lbl"))
    )
    w = Window.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("lbl"))
    sw0, t0 = shuffle_write_bytes(spark), time.time()
    for _ in range(3):
        cnt = (
            sym.join(labels, sym.s == labels.lv)
            .groupBy(F.col("d").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("lv"), "lbl")
            .localCheckpoint(eager=True)
        )
    n_comm = labels.select("lbl").distinct().count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    return {
        "sym_edges": n_edges, "rounds": 3, "communities": n_comm,
        "sec": round(t1 - t0, 2),
        "sec_per_round": round((t1 - t0) / 3, 2),
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
    }


def probe_pagerank(spark, sf_dir, mult) -> dict:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    pairs = _replicate(pairs, ["c", "s"], mult)
    edges = pairs.select(
        (2 * F.col("c")).alias("src"), (2 * F.col("s") + 1).alias("dst")
    ).unionAll(
        pairs.select((2 * F.col("s") + 1).alias("src"), (2 * F.col("c")).alias("dst"))
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    ).localCheckpoint(eager=True)
    ranks = deg.select("node", F.lit(1000000).cast("long").alias("rank_micro"))
    sw0, t0 = shuffle_write_bytes(spark), time.time()
    for _ in range(3):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(
                deg.select(F.col("node").alias("dn"), "degree"),
                F.col("src") == F.col("dn"),
            )
            .select("dst", F.expr("rank_micro div degree").alias("part"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("part").alias("contrib"))
        )
        ranks = deg.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(150000) + F.expr("850000 * coalesce(contrib, 0) div 1000000")
            ).cast("long").alias("rank_micro"),
        ).localCheckpoint(eager=True)
    n_nodes = ranks.count()
    t1, sw1 = time.time(), shuffle_write_bytes(spark)
    return {
        "edges": n_edges, "nodes": n_nodes, "rounds": 3,
        "sec": round(t1 - t0, 2),
        "sec_per_round": round((t1 - t0) / 3, 2),
        "shuffle_mb": round((sw1 - sw0) / 1e6, 1) if sw1 >= 0 else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mults = [int(m) for m in sys.argv[2:]] or [1, 10, 50]
    spark = probe_session()
    for mult in mults:
        rec = {"mult": mult}
        rec["components"] = probe_components(spark, sf_dir, mult)
        rec["lpa"] = probe_lpa(spark, sf_dir, mult)
        rec["pagerank"] = probe_pagerank(spark, sf_dir, mult)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
