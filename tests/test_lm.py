"""operators/lm.py — CCNet-style statistical-LM quality scoring.

Brute-force equivalence on a tiny corpus (python floats vs the
decimal-summed Spark plan), determinism across partitionings, and the
smoothing/backoff edge cases (unseen token, unseen history, single-token
document)."""

from __future__ import annotations

import math

import pytest

from zinger_spark.operators import lm


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat", "en"),
            (1, "the dog sat", "en"),
            (2, "le chat", "fr"),
            (3, "zzz", "fr"),  # all-unseen tokens
            (4, "the", "fr"),  # single token: no bigrams
        ],
        "doc_id long, text string, lang string",
    )


def _expected_unigram(train_texts, all_docs, digits=6):
    counts: dict[str, int] = {}
    for t in train_texts:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    n, v = sum(counts.values()), len(counts)
    out = {}
    for doc_id, text in all_docs:
        toks = [w for w in text.split(" ") if w]
        s = sum(-math.log((counts.get(w, 0) + 1) / (n + v)) for w in toks)
        out[doc_id] = (len(toks), round(s / len(toks), digits))
    return out


def test_unigram_matches_bruteforce(corpus):
    train = corpus.filter("lang = 'en'")
    model = lm.train_unigram(train)
    got = {
        r["doc_id"]: (r["n_tokens"], r["xent"])
        for r in lm.cross_entropy_unigram(corpus, model).collect()
    }
    want = _expected_unigram(
        ["the cat sat", "the dog sat"],
        [(r["doc_id"], r["text"]) for r in corpus.collect()],
    )
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
    # trusted-slice docs score lower than the all-unseen doc
    assert got[0][1] < got[3][1] and got[1][1] < got[3][1]


def test_unigram_deterministic_across_partitionings(corpus):
    train = corpus.filter("lang = 'en'")
    model = lm.train_unigram(train)
    a = sorted(
        lm.cross_entropy_unigram(corpus.repartition(1), model).collect()
    )
    b = sorted(
        lm.cross_entropy_unigram(corpus.repartition(7, "doc_id"), model).collect()
    )
    assert a == b  # exact equality — decimal summation, not float


def test_bigram_backoff_and_single_token_doc(corpus):
    train = corpus.filter("lang = 'en'")
    uni, big = lm.train_unigram(train), lm.train_bigram(train)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in lm.cross_entropy_bigram(corpus, uni, big).collect()
    }
    # doc 4 has one token -> no bigrams -> absent from the output
    assert 4 not in got
    assert got[0][0] == 2  # "the cat", "cat sat"
    # seen bigrams score lower than all-unseen ones
    assert got[0][1] < got[2][1]
    # hand-check one document: doc 0 = "the cat sat"
    counts = {"the": 2, "cat": 1, "dog": 1, "sat": 2}
    n, v = 6, 4
    bigs = {("the", "cat"): 1, ("the", "dog"): 1, ("cat", "sat"): 1, ("dog", "sat"): 1}

    def p(w1, w2):
        pb = bigs.get((w1, w2), 0) / counts[w1] if w1 in counts else 0.0
        pu = (counts.get(w2, 0) + 1) / (n + v)
        return 0.9 * pb + (1 - 0.9) * pu

    want = round(
        -(math.log(p("the", "cat")) + math.log(p("cat", "sat"))) / 2, 6
    )
    assert got[0][1] == pytest.approx(want, abs=2e-6)


def test_bigram_unseen_history_is_finite(spark):
    train = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    score_me = spark.createDataFrame([(1, "q r")], "doc_id long, text string")
    uni, big = lm.train_unigram(train), lm.train_bigram(train)
    row = lm.cross_entropy_bigram(score_me, uni, big).collect()[0]
    assert math.isfinite(row["xent"]) and row["xent"] > 0


def test_merged_model_equals_union_trained(spark):
    """Count addition is exact: scoring under merge(train(A), train(B))
    must equal scoring under train(A ∪ B) bit-for-bit — the property
    that makes a per-batch model sidecar legal at ingest time."""
    a = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "a cat ran"), (3, "the cat ran far")], "doc_id long, text string"
    )
    score_me = spark.createDataFrame(
        [(9, "the cat ran"), (10, "dog far zzz")], "doc_id long, text string"
    )
    merged = lm.merge_unigram(lm.train_unigram(a), lm.train_unigram(b))
    union = lm.train_unigram(a.unionByName(b))
    got_m = sorted(lm.cross_entropy_unigram(score_me, merged).collect())
    got_u = sorted(lm.cross_entropy_unigram(score_me, union).collect())
    assert got_m == got_u
    mb = lm.merge_bigram(lm.train_bigram(a), lm.train_bigram(b))
    ub = lm.train_bigram(a.unionByName(b))
    gm = sorted(lm.cross_entropy_bigram(score_me, merged, mb).collect())
    gu = sorted(lm.cross_entropy_bigram(score_me, union, ub).collect())
    assert gm == gu
