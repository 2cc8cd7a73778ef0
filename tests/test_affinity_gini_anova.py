"""Invariants for token affinity, transition Gini, and the ANOVA F.

- brand_name_token_affinity: lifts recompute by exact cross-multiplied
  integer math; the support floor holds; a token appearing only in one
  brand has affinity ~ nn/bn.
- events_transition_gini: impurity recomputes; single-successor types
  score 0; impurity bounded by 1 - 1/k.
- docs_length_anova_f: F matches a local numpy ANOVA within the
  micro-term floor slack; F > 0.
"""

from collections import defaultdict

import numpy as np

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T
from gravity_spark.functions import text as tx


def test_affinity_recompute(spark, sf_dir):
    rows = REGISTRY["brand_name_token_affinity"].spark(spark, sf_dir).collect()
    part = T(spark, sf_dir, "part").select("p_brand", "p_name").collect()
    bt = defaultdict(int)
    gt = defaultdict(int)
    btot = defaultdict(int)
    nn = 0
    import re

    for r in part:
        for t in re.split(r"[^a-z0-9]+", r["p_name"].lower()):
            if not t:
                continue
            bt[(r["p_brand"], t)] += 1
            gt[t] += 1
            btot[r["p_brand"]] += 1
            nn += 1
    expected = {k: v for k, v in bt.items() if v >= 3}
    got = {(r["brand"], r["token"]): r for r in rows}
    assert set(got) == set(expected)
    for (b, t), r in got.items():
        n = bt[(b, t)]
        assert r["n"] == n
        num = 2000 * n * nn + btot[b] * gt[t]
        assert r["affinity_milli"] == num // (2 * btot[b] * gt[t])


def test_transition_gini_bounds(spark, sf_dir):
    rows = REGISTRY["events_transition_gini"].spark(spark, sf_dir).collect()
    ev = (
        T(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = defaultdict(lambda: defaultdict(int))
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[a][b] += 1
    assert {r["event_type"] for r in rows} == set(trans)
    for r in rows:
        cs = trans[r["event_type"]]
        tot = sum(cs.values())
        sq = sum(v * v for v in cs.values())
        assert r["n_transitions"] == tot
        assert r["n_successors"] == len(cs)
        expect = (1000000 * (tot * tot - sq) + (tot * tot) // 2) // (tot * tot)
        assert r["gini_micro"] == expect
        k = len(cs)
        assert 0 <= r["gini_micro"] <= 1000000 * (k - 1) // k + 1


def test_anova_matches_numpy(spark, sf_dir):
    r = REGISTRY["docs_length_anova_f"].spark(spark, sf_dir).collect()[0]
    docs = T(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    groups = defaultdict(list)
    for d in docs:
        groups[d["lang"]].append(int(d["n_chars"]))
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    assert r["n_groups"] == k and r["n_docs"] == n
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - np.mean(v)) ** 2 for x in v) for v in groups.values()
    )
    f_local = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r["f_stat"] - f_local) < 1e-3  # micro-floor slack
    assert r["f_stat"] > 0
