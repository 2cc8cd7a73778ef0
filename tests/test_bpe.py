"""BPE tokenizer: merge-table determinism, segmentation round-trip,
and the rows-only query's stability (it has no SQL oracle)."""

from gravity_spark.functions.text import bpe_segment, train_bpe
from gravity_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_train_bpe_expected_merges():
    # "abab"-dominated corpus: ('a','b') first (count 25); then
    # ('ab','</w>') (count 15: abab's tail ab + the standalone word)
    # beats ('ab','ab') (count 10); then ('ab','ab</w>') closes abab
    counts = [("abab", 10), ("ab", 5), ("cd", 1)]
    merges = train_bpe(counts, n_merges=4)
    assert merges == [("a", "b"), ("ab", "</w>"), ("ab", "ab</w>"), ("c", "d")]


def test_train_bpe_tie_breaks_lexicographic():
    # equal counts everywhere → smallest pair lexicographically first
    counts = [("ba", 1), ("dc", 1)]
    merges = train_bpe(counts, n_merges=1)
    assert merges[0] == ("a", "</w>")  # ('a','</w>') < ('b','a') < ('c','</w>') …


def test_segment_roundtrip():
    counts = [("sparkle", 5), ("spark", 9), ("park", 7), ("lark", 3)]
    merges = train_bpe(counts, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts:
        segs = bpe_segment(w, ranks)
        assert "".join(segs).replace("</w>", "") == w
    # unseen word still segments losslessly (falls back toward chars)
    segs = bpe_segment("sparkplug", ranks)
    assert "".join(segs).replace("</w>", "") == "sparkplug"


def test_bpe_query_deterministic(spark):
    fn = REGISTRY["bpe_tokenize"].spark
    a = sorted(tuple(r) for r in fn(spark, SF).collect())
    b = sorted(tuple(r) for r in fn(spark, SF).collect())
    assert a == b
    assert len(a) > 0
    for doc_id, n_ws, n_bpe, ratio in a:
        assert n_bpe >= n_ws  # </w>-terminated segments ≥ 1 per word
        assert ratio == (1000 * n_bpe + n_ws // 2) // n_ws
