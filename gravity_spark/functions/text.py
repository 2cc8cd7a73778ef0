"""Text analysis for training-data pipelines — all JVM-side expressions.

These are net-new capabilities beyond the reference (which moves rows,
never inspects text). Everything here is built from pyspark.sql.functions
so it stays inside whole-stage codegen — no Python in the hot path, which
is what makes a 100 TB documents sweep feasible.

Semantics are deliberately SQL-reproducible (the DuckDB oracle runs the
same logic), so: regex-based tokenization, arithmetic scores, md5-based
fingerprints — no library-specific behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: matches one token: letters/digits runs (BPE-ish: splits punctuation off)
TOKEN_RE = "[a-zA-Z0-9]+"

#: tiny per-language stopword marker sets for the n-gram/marker heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "zh": ["de", "shi", "le"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokenize(text: Column) -> Column:
    """Lower-cased alnum tokens; empty strings filtered out."""
    return F.filter(
        F.split(F.lower(text), "[^a-zA-Z0-9]+"), lambda t: t != ""
    )


def token_count(text: Column, tokens: Column | None = None) -> Column:
    """Whitespace/punct-delimited token count (regexp_count keeps the
    same semantics in the DuckDB oracle)."""
    return F.size(tokens if tokens is not None else tokenize(text))


def quality_score(text: Column, tokens: Column | None = None) -> Column:
    """Deterministic quality heuristic in [0, 1]:
      0.4 * length_score  (chars/2000 capped at 1)
    + 0.3 * (1 - punct_ratio)
    + 0.3 * stopword_presence_ratio

    Computed as ONE exact integer rational and a single double division,
    so any engine implementing the same formula produces a bit-identical
    double (the DuckDB oracle depends on this).
    """
    n = F.length(text).cast("long")
    n_punct = n - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", "")).cast("long")
    toks = tokens if tokens is not None else tokenize(text)
    t = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda tok: tok.isin(*STOPWORDS))).cast("long")
    n_d = F.greatest(n, F.lit(1))
    t_d = F.greatest(t, F.lit(1))
    num = (
        F.lit(4) * F.least(n, F.lit(2000)) * n_d * t_d
        + F.lit(6000) * t_d * (n_d - n_punct)
        + F.lit(6000) * n_d * n_stop
    )
    den = F.lit(20000) * n_d * t_d
    return num.cast("double") / den.cast("double")


def detect_language(text: Column, tokens: Column | None = None) -> Column:
    """Marker-token language ID: the language whose marker set hits the
    most tokens wins; ties and zero-hits → 'und'. Cheap n-gram-style
    heuristic that the SQL oracle reproduces exactly."""
    toks = tokens if tokens is not None else tokenize(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # fixed iteration order => deterministic tie-break (first max wins)
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        is_better = hits > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lower-cased,
    tokens joined by single spaces). Collapses whitespace/punctuation
    variants of the same content to one key — the exact-dedup and
    near-dup pipelines both key on it."""
    return F.md5(F.array_join(tokenize(text), " "))


def feature_bucket(tok: Column, n_buckets: int = 4096) -> Column:
    """Hashed feature id (the fasttext hashing trick): first 8 hex
    digits of md5 → integer, mod the bucket count. Portable — any SQL
    engine reproduces it from md5."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % n_buckets)


def hashed_linear_classifier(
    docs,
    label_col: str = "lang",
    positive: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    train_mod: int = 5,
):
    """Train-and-score a hashed-feature linear classifier (fasttext-
    style architecture, Naive-Bayes log-odds training) entirely inside
    the engine — the quality/language-classifier stage of an LLM data
    pipeline, with REAL learned weights rather than a shipped model.

    Train split = docs with id % train_mod == 0: per hashed token
    bucket, Laplace-smoothed log-odds of positive vs rest, in integer
    micro-logs (each ln() rounded to 6dp first — the perplexity_filter
    determinism discipline, so a SQL oracle reproduces every weight).
    Held-out docs score as the exact integer sum of their tokens'
    weights; prediction = score > 0.

    Returns (id, score_micro, pred, correct).

    Scale shape: training is one aggregation keyed by bucket id (≤
    n_buckets reducer rows after map-side combine); the learned weight
    table is ≤ n_buckets rows → broadcast; scoring is a map-side join +
    one per-doc sum. No stage depends on corpus size beyond the linear
    token scan. Swap the NB closed form for logistic SGD at deployment
    and only the weight-table producer changes.
    """
    from pyspark.sql import DataFrame  # noqa: F401

    toks = docs.select(
        F.col(id_col),
        F.col(label_col).alias("__label"),
        F.explode(tokenize(F.col(text_col))).alias("__tok"),
    ).withColumn("__b", feature_bucket(F.col("__tok"), n_buckets))

    train = toks.filter((F.col(id_col) % train_mod) == 0)
    is_pos = (F.col("__label") == positive).cast("long")
    cnt = train.groupBy("__b").agg(
        F.sum(is_pos).alias("n_pos"),
        F.sum(F.lit(1) - is_pos).alias("n_neg"),
    )
    tot = train.agg(
        F.sum(is_pos).alias("t_pos"),
        F.sum(F.lit(1) - is_pos).alias("t_neg"),
    )

    def _ln6(x):
        return F.round(F.log(x.cast("double")), 6)

    def _w_micro(n_pos, n_neg):
        return F.round(
            (
                _ln6(n_pos + F.lit(1))
                - _ln6(F.col("t_pos") + F.lit(n_buckets))
                - _ln6(n_neg + F.lit(1))
                + _ln6(F.col("t_neg") + F.lit(n_buckets))
            )
            * 1000000,
            0,
        ).cast("long")

    weights = cnt.crossJoin(F.broadcast(tot)).select(
        "__b", _w_micro(F.col("n_pos"), F.col("n_neg")).alias("__w")
    )
    default_w = tot.select(
        _w_micro(F.lit(0), F.lit(0)).alias("__dw")
    )

    held = toks.filter((F.col(id_col) % train_mod) != 0)
    scored = (
        held.join(F.broadcast(weights), "__b", "left")
        .crossJoin(F.broadcast(default_w))
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("__w"), F.col("__dw"))).alias("score_micro"),
            F.any_value(F.col("__label")).alias("__actual"),
        )
    )
    pred = F.when(F.col("score_micro") > 0, F.lit(positive)).otherwise(F.lit("other"))
    actual = F.when(F.col("__actual") == positive, F.lit(positive)).otherwise(
        F.lit("other")
    )
    return scored.select(
        id_col,
        "score_micro",
        pred.alias("pred"),
        (pred == actual).alias("correct"),
    )


# ---------------------------------------------------------------------
# BPE tokenizer trained in-engine (Sennrich et al. 2016)
# ---------------------------------------------------------------------


def train_bpe(word_counts: list[tuple[str, int]], n_merges: int = 40) -> list[tuple[str, str]]:
    """Learn a byte-pair-encoding merge table from (word, count) pairs.

    Deterministic: ties on pair frequency break to the lexicographically
    smallest pair, so the merge sequence is a pure function of the
    counts. Runs driver-side over the AGGREGATED vocabulary (the
    industry-standard shape — tokenizers train on word counts from a
    bounded sample, never on the raw corpus; the distributed parts are
    the count aggregation before and the encode after)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + ("</w>",): int(c) for w, c in word_counts if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge loop (the classic encoder)."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_map(merges: list[tuple[str, str]], text_col: str = "text"):
    """mapInPandas factory: per Arrow batch, whitespace-split + lowercase
    each document, BPE-segment every word with a per-batch word cache
    (Zipfian corpora hit the cache constantly), emit token counts.
    The merge table travels in the task closure — a few KB."""
    import re as _re

    ranks = {p: i for i, p in enumerate(merges)}
    word_re = _re.compile(r"[a-z0-9]+")

    def fn(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            n_ws, n_bpe = [], []
            for text in pdf[text_col].fillna(""):
                words = word_re.findall(text.lower())
                total = 0
                for w in words:
                    k = cache.get(w)
                    if k is None:
                        k = len(bpe_segment(w, ranks))
                        cache[w] = k
                    total += k
                n_ws.append(len(words))
                n_bpe.append(total)
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_ws": n_ws, "n_bpe": n_bpe}
            )
            yield out

    return fn
