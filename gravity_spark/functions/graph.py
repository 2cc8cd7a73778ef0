"""Graph primitives: degree-oriented triangle enumeration.

Triangle counting via wedge closure is join-shaped and Spark-native,
but the wedge count is Σ outdeg² — under power-law skew an id-oriented
hub generates O(d_max²) wedges. The standard fix (Chiba–Nishizeki /
Schank's forward algorithm, also the GraphX/Giraph production shape) is
DEGREE ORIENTATION: direct every undirected edge from its
lower-(degree, id) endpoint to the higher one. Every vertex then has
out-degree O(√m), so Σ outdeg² is O(m^1.5) worst-case and near-linear
on real power-law graphs, and each triangle is counted exactly once at
its ≺-smallest vertex.

Reference parity note: gravity (the CDC engine) has no graph operators;
these primitives back the co-purchase analytics battery
(queries.py::graph_triangle_count et al.) that SURVEY §2.5 carries as
engine-completeness queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """Vertex degrees of an undirected, deduplicated edge list with
    columns (u, v). Output: (x, d). One union + groupBy — the shuffle
    carries (vertex, 1) pairs only."""
    return (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def degree_orient(edges: DataFrame) -> DataFrame:
    """Orient each undirected edge {u, v} from the lower-(degree, id)
    endpoint to the higher: output (lo, hi, dhi) where
    (d(lo), lo) < (d(hi), hi). dhi rides along so downstream wedge
    formation can compare ≺ without re-joining degrees.

    The two degree joins shuffle on vertex id — never broadcast: the
    degree table is vertex-sized. Orientation is a projection after the
    joins; no extra shuffle."""
    deg = degrees(edges)
    e = (
        edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
    )


def oriented_wedges(oriented: DataFrame) -> DataFrame:
    """Open wedges of a degree-oriented edge list: for every center
    ``lo`` with out-neighbors b ≺ c, one row (wa=center, wb=b, wc=c).
    Self-join on the center — with degree orientation the per-center
    out-neighborhood is O(√m), so the join output is bounded even on
    power-law graphs."""
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    lt = (F.col("o1.dhi") < F.col("o2.dhi")) | (
        (F.col("o1.dhi") == F.col("o2.dhi")) & (F.col("o1.hi") < F.col("o2.hi"))
    )
    return o1.join(o2, (F.col("o1.lo") == F.col("o2.lo")) & lt).select(
        F.col("o1.lo").alias("wa"),
        F.col("o1.hi").alias("wb"),
        F.col("o2.hi").alias("wc"),
    )


def kcore(edges: DataFrame, k: int, max_rounds: int = 30) -> tuple[DataFrame, int]:
    """Peel an undirected edge list (u, v) to the k-core FIXPOINT:
    repeatedly drop vertices of degree < k (and their edges) until a
    round removes nothing, with ``max_rounds`` as a safety cap for
    adversarial inputs (a path graph needs ~n/2 rounds; real power-law
    graphs converge in a handful). Returns (core_edges, rounds_run).

    Scale shape per round: ONE job — the degree aggregation, the two
    LEFT SEMI prunes of the (only ever shrinking) edge list, the
    lineage-truncating localCheckpoint, AND the fixpoint scalar, fused:
    the checkpoint is taken LAZILY and the edge count() that drives the
    fixpoint test is the materializing action, so caching the round's
    edge list and counting it are the same pass (an edge survives iff
    both endpoints have d ≥ k, and every vertex in an edge list has
    d ≥ 1, so an unchanged edge count ⟺ the round removed nothing ⟺
    fixpoint — the r6 two-job shape re-derived the same fact from a
    separate vertex-sized agg). The degree frame appears under both
    semi-join probes; its shuffle runs once via exchange reuse, not an
    explicit persist (persisting a tiny twice-referenced agg serializes
    the probe subtrees — measured slower). Nothing corpus-sized ever
    reaches the driver. The prior round's checkpoint block is freed
    (non-blocking) as soon as the new round materializes — by its EXACT
    RDD id via _checkpoint_rdd_id, never a global persistent-set diff,
    so blocks persisted concurrently by another query sharing the
    session are untouchable — and a long peel holds ONE edge-list copy
    in executor storage."""
    from gravity_spark.functions.dedup import (
        _checkpoint_rdd_id,
        _fixpoint_partitions,
        _unpersist_rdds,
    )

    edges = edges.select("u", "v").localCheckpoint()
    prev_id = _checkpoint_rdd_id(edges)
    n_prev = edges.count()
    rounds = 0
    # loop shuffle partitions scale to the edge count (see
    # _fixpoint_partitions: a downsize-only, size-derived scope)
    with _fixpoint_partitions(edges.sparkSession, n_prev):
        while rounds < max_rounds:
            deg = degrees(edges)
            keep = deg.filter(F.col("d") >= k).select("x")
            pruned = (
                edges.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
                .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
                .select("u", "v")
                .localCheckpoint(eager=False)
            )
            rounds += 1
            n_new = pruned.count()  # materializes the lazy checkpoint
            if prev_id is not None:  # pruned is materialized — free prior round
                _unpersist_rdds(pruned, {prev_id})
            prev_id = _checkpoint_rdd_id(pruned)
            edges = pruned
            if n_new == n_prev or n_new == 0:  # fixpoint (or empty core)
                return edges, rounds
            n_prev = n_new
    return edges, rounds


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected (u < v, deduplicated) edge
    list: degree-orient, form wedges at each ≺-smallest vertex, close
    them against the oriented edges (the closing edge wb→wc is oriented
    wb ≺ wc by construction, so one equi-join suffices). Returns a
    single row (n_triangles). The count is orientation-invariant —
    id-oriented SQL oracles agree."""
    # persist: the oriented edge list is read three times (both wedge
    # sides + the closing probe) — without it each reference recomputes
    # the degree joins
    oriented = degree_orient(edges).persist()
    w = oriented_wedges(oriented)
    e3 = oriented.alias("e3")
    return w.join(
        e3, (F.col("e3.lo") == F.col("wb")) & (F.col("e3.hi") == F.col("wc"))
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
