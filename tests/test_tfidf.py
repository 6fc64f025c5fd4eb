"""tfidf_topk tests: exact score/rank vs a Python brute force, rare-term
preference over common terms, blank-doc handling, and tie determinism."""

from __future__ import annotations

import pytest

from fairy_core_spark.operators.text import tfidf_topk

SCHEMA = "doc_id long, text string"


def _brute(rows, k, scale):
    toks = {i: [t for t in txt.split() if t] for i, txt in rows}
    n = len(rows)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((tf[t] * scale * n) // df[t], t) for t in tf
        )
        ranked = sorted(scored, key=lambda p: (-p[0], p[1]))[:k]
        out[i] = [(t, tf[t], df[t], s) for s, t in ranked]
    return out


def test_matches_bruteforce(spark):
    rows = [
        (1, "apple banana apple cherry zebra"),
        (2, "banana banana cherry cherry cherry dog"),
        (3, "apple dog dog elephant elephant elephant"),
        (4, "zebra cherry banana apple"),
    ]
    got: dict[int, list] = {}
    res = tfidf_topk(spark.createDataFrame(rows, SCHEMA), k=3).collect()
    for r in sorted(res, key=lambda r: (r.doc_id, r.rk)):
        got.setdefault(r.doc_id, []).append((r.term, r.tf, r.doc_freq, r.score))
    assert got == _brute(rows, 3, 1_000_000)


def test_rare_term_beats_common_at_equal_tf(spark):
    rows = [(i, "the common filler") for i in range(9)] + [
        (99, "the unique filler")
    ]
    res = [
        r
        for r in tfidf_topk(spark.createDataFrame(rows, SCHEMA), k=1).collect()
        if r.doc_id == 99
    ]
    assert res[0].term == "unique"  # df=1 dominates df=10 terms


def test_blank_docs_emit_nothing_but_count_in_n(spark):
    rows = [(1, "alpha beta"), (2, "   "), (3, "")]
    res = tfidf_topk(spark.createDataFrame(rows, SCHEMA), k=5).collect()
    assert {r.doc_id for r in res} == {1}
    # N = 3 (all rows) even though two docs are blank: score = tf*scale*3/df
    alpha = [r for r in res if r.term == "alpha"][0]
    assert alpha.score == 1 * 1_000_000 * 3 // 1


def test_tie_breaks_by_term_asc(spark):
    rows = [(1, "bb aa"), (2, "aa bb")]  # identical tf/df -> identical score
    res = tfidf_topk(spark.createDataFrame(rows, SCHEMA), k=2).collect()
    for doc in (1, 2):
        ranked = sorted([r for r in res if r.doc_id == doc], key=lambda r: r.rk)
        assert [r.term for r in ranked] == ["aa", "bb"]


def test_invalid_params(spark):
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    with pytest.raises(ValueError):
        tfidf_topk(df, k=0)
    with pytest.raises(ValueError):
        tfidf_topk(df, scale=0)
