"""Incremental dedup: new batch vs a maintained corpus index.

Equivalence contract: incremental_minhash_pairs over (index(corpus),
new) yields exactly the pairs of minhash_lsh_pairs(corpus ∪ new) that
touch a new doc — the index buys incrementality, never different
answers.  Plus index save/load/merge round-trips and the exact-dedup
keep rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zinger_spark.operators import dedup as zd


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = []
    for i in range(30):
        if i % 7 == 0:
            text = base  # exact-dup cluster
        elif i % 7 == 1:
            text = base + f" variant {i}"  # near-dup of base
        else:
            text = f"document {i} " + " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def split(docs):
    return docs.filter(F.col("doc_id") % 5 != 0), docs.filter(F.col("doc_id") % 5 == 0)


def test_incremental_exact_keep_rules(spark, docs):
    corpus, new = split(docs)
    fresh = zd.incremental_exact_dedup(corpus, new)
    ids = {r.doc_id for r in fresh.collect()}
    # doc 0/5/10/... with i%7==0 (0) duplicates corpus copies (7, 14, 21, 28) -> dropped
    assert 0 not in ids
    # within-batch dup: none of the %5 docs share text besides the base cluster
    # unique new docs survive
    assert 5 in ids and 10 in ids
    # every surviving hash is absent from the corpus
    corpus_hashes = {
        r.content_hash for r in zd.dedup_exact(corpus).select("content_hash").collect()
    }
    for r in fresh.collect():
        assert r.content_hash not in corpus_hashes


def test_incremental_matches_full_restricted(spark, docs):
    corpus, new = split(docs)
    full = zd.minhash_lsh_pairs(docs, jaccard_threshold=0.3, max_bucket=10**6)
    want = {
        (r.doc_a, r.doc_b)
        for r in full.collect()
        if r.doc_a % 5 == 0 or r.doc_b % 5 == 0
    }
    index = zd.build_minhash_index(corpus)
    pairs, _ = zd.incremental_minhash_pairs(
        index, new, jaccard_threshold=0.3, max_bucket=10**6
    )
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got == want
    assert want, "fixture must produce at least one touching-new pair"


def test_index_save_load_merge_roundtrip(spark, docs, tmp_path):
    corpus, new = split(docs)
    index = zd.build_minhash_index(corpus)
    zd.save_minhash_index(index, str(tmp_path / "idx"))
    loaded = zd.load_minhash_index(spark, str(tmp_path / "idx"))
    pairs_mem, new_idx = zd.incremental_minhash_pairs(
        index, new, jaccard_threshold=0.3, max_bucket=10**6
    )
    pairs_disk, _ = zd.incremental_minhash_pairs(
        loaded, new, jaccard_threshold=0.3, max_bucket=10**6
    )
    assert {tuple(r) for r in pairs_mem.collect()} == {
        tuple(r) for r in pairs_disk.collect()
    }
    # merged index == index built over the whole corpus (row-set equal)
    merged = zd.merge_minhash_index(loaded, new_idx)
    whole = zd.build_minhash_index(docs)
    for name in ("bands", "sizes"):
        assert {tuple(r) for r in merged[name].collect()} == {
            tuple(r) for r in whole[name].collect()
        }


def test_incremental_embedding_matches_full_restricted(spark):
    from zinger_spark.operators.similarity import (
        embedding_dup_pairs,
        incremental_embedding_dups,
    )

    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 6 == 0:  # a near-dup neighbor
            rows.append((100 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = embedding_dup_pairs(
        emb, threshold=0.95, dims=(0, 1, 2), max_bucket=None
    )
    want = {
        (r.a, r.b) for r in full.collect() if r.a % 5 == 0 or r.b % 5 == 0
    }
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    got = {
        (r.a, r.b)
        for r in incremental_embedding_dups(
            corpus, new, threshold=0.95, dims=(0, 1, 2), max_bucket=None
        ).collect()
    }
    assert got == want
    assert want, "fixture must produce touching-new vector pairs"


def test_semantic_dedup_keeps_one_per_component(spark):
    from zinger_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.998, 0.02, 0.0, 0.0]),   # near-dup of 0/1 (one component)
        (3, [0.0, 1.0, 0.0, 0.0]),      # its own cluster
        (4, [-1.0, 0.0, 0.0, 0.0]),     # opposite cell, singleton
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]]
    out = {r.vec_id: (r.rep_id, r.keep) for r in
           semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert out[0] == (0, True)
    assert out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True) and out[4] == (4, True)


def test_second_batch_sees_first(spark, docs, tmp_path):
    """The maintained-index loop: accept batch 1, merge, then batch 2
    finds its dups against batch-1 docs."""
    corpus = docs.filter(F.col("doc_id") < 10)
    b1 = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20))
    b2 = docs.filter(F.col("doc_id") >= 20)
    index = zd.build_minhash_index(corpus)
    _, idx1 = zd.incremental_minhash_pairs(index, b1, jaccard_threshold=0.3,
                                           max_bucket=10**6)
    index = zd.merge_minhash_index(index, idx1)
    pairs2, _ = zd.incremental_minhash_pairs(index, b2, jaccard_threshold=0.3,
                                             max_bucket=10**6)
    got = {(r.doc_a, r.doc_b) for r in pairs2.collect()}
    # doc 21 (i%7==0, exact base) must pair with doc 14 from batch 1
    assert (14, 21) in got


def test_incremental_hamming_matches_full_restricted(spark):
    """incremental_hamming_dups(corpus, new) == hamming_dup_pairs(all)
    filtered to pairs with a new side — on fingerprints dense enough
    that every band bucket collides (4-bit bands over 16 bits)."""
    rows = [(i, ((i * 2654435761) % (1 << 16)) - (1 << 15)) for i in range(120)]
    # plant exact twins and 1-bit neighbors across the batch boundary
    rows += [(1000 + i, rows[i * 5][1]) for i in range(10)]
    rows += [(2000 + i, rows[i * 5][1] ^ 1) for i in range(10)]
    fps = spark.createDataFrame(rows, "doc_id long, simhash long")
    new = fps.filter(F.col("doc_id") % 3 == 0)
    corpus = fps.filter(F.col("doc_id") % 3 != 0)

    full = {
        (r.id_a, r.id_b, r.hamming)
        for r in zd.hamming_dup_pairs(
            fps, fp_col="simhash", bits=16, max_hamming=2
        ).collect()
        if r.id_a % 3 == 0 or r.id_b % 3 == 0
    }
    inc = {
        (r.id_a, r.id_b, r.hamming)
        for r in zd.incremental_hamming_dups(
            corpus, new, fp_col="simhash", bits=16, max_hamming=2
        ).collect()
    }
    assert inc == full and full  # non-vacuous


# ---------------------------------------------------------------------------
# r12: exact duplicate-span detection (ExactSubstr at word granularity)


def _spans(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
        for r in zd.duplicate_spans(df, **kw).collect()
    }


def test_duplicate_spans_exact_position_and_length(spark):
    """A 14-token span shared mid-document is reported once, maximal,
    with the right 0-based offsets in each doc."""
    shared = " ".join(f"s{i}" for i in range(14))
    docs = [
        (1, "a1 a2 a3 " + shared + " a4"),
        (2, "b1 " + shared + " b2 b3 b4 b5"),
    ]
    assert _spans(spark, docs, k=8, min_len=12) == {(1, 2, 3, 1, 14)}


def test_duplicate_spans_min_len_filter(spark):
    """An 11-token shared run stays below min_len=12."""
    shared = " ".join(f"s{i}" for i in range(11))
    docs = [(1, shared + " x1 x2"), (2, "y1 " + shared)]
    assert _spans(spark, docs, k=8, min_len=12) == set()
    # the same corpus at min_len=11 reports it
    assert _spans(spark, docs, k=8, min_len=11) == {(1, 2, 0, 1, 11)}


def test_duplicate_spans_gap_splits_runs(spark):
    """Two shared spans separated by a mismatch are two islands, not
    one merged run."""
    s1 = " ".join(f"p{i}" for i in range(12))
    s2 = " ".join(f"q{i}" for i in range(13))
    docs = [
        (1, s1 + " mid1 " + s2),
        (2, s1 + " DIFFERENT " + s2),
    ]
    got = _spans(spark, docs, k=8, min_len=12)
    assert got == {(1, 2, 0, 0, 12), (1, 2, 13, 13, 13)}


def test_duplicate_spans_repeated_span_both_alignments(spark):
    """doc 2 contains the span twice: one span row per alignment."""
    s = " ".join(f"r{i}" for i in range(12))
    docs = [(1, s), (2, s + " z1 z2 " + s)]
    got = _spans(spark, docs, k=8, min_len=12)
    assert got == {(1, 2, 0, 0, 12), (1, 2, 0, 14, 12)}


def test_duplicate_spans_max_df_cap_drops_boilerplate(spark):
    """A span present in MORE than max_df docs generates no pairs (the
    boilerplate guard); raising the cap restores them."""
    s = " ".join(f"c{i}" for i in range(12))
    docs = [(i, f"u{i} " + s) for i in range(1, 5)]  # span in 4 docs
    assert _spans(spark, docs, k=8, min_len=12, max_df=3) == set()
    assert len(_spans(spark, docs, k=8, min_len=12, max_df=10)) == 6  # C(4,2)


def test_duplicate_spans_min_len_below_k_rejected(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        zd.duplicate_spans(df, k=8, min_len=7)


def _removal(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = zd.duplicate_spans(df, **kw)
    return {
        r.doc_id: (r.text, r.removed_tokens)
        for r in zd.remove_duplicate_spans(df, spans).collect()
    }


def test_remove_duplicate_spans_cuts_later_copy_only(spark):
    shared = " ".join(f"s{i}" for i in range(14))
    docs = [
        (1, "a1 a2 a3 " + shared + " a4"),
        (2, "b1 " + shared + " b2"),
    ]
    got = _removal(spark, docs, k=8, min_len=12)
    # the earliest copy (doc 1) survives verbatim
    assert got[1] == ("a1 a2 a3 " + shared + " a4", 0)
    # doc 2's copy is cut, surrounding tokens intact
    assert got[2] == ("b1 b2", 14)


def test_remove_duplicate_spans_merges_overlapping_ranges(spark):
    """doc 3 shares overlapping spans with docs 1 AND 2; the cut ranges
    merge, so overlapped tokens are removed once, not double-counted."""
    words = [f"w{i}" for i in range(20)]
    docs = [
        (1, " ".join(words[:14])),       # matches doc 3 positions 0..13
        (2, " ".join(words[6:20])),      # matches doc 3 positions 6..19
        (3, " ".join(words)),            # victim: both spans overlap
    ]
    got = _removal(spark, docs, k=8, min_len=12)
    assert got[1][1] == 0 and got[2][1] == 0
    # ranges [0,14) and [6,20) merge to [0,20): the whole doc goes
    assert got[3] == ("", 20)


def test_remove_duplicate_spans_untouched_docs_pass_verbatim(spark):
    docs = [(1, "only   doc with   odd spacing")]
    got = _removal(spark, docs, k=8, min_len=12)
    # no spans -> byte-identical pass-through (whitespace untouched)
    assert got[1] == ("only   doc with   odd spacing", 0)


def test_remove_duplicate_spans_converges(spark):
    """Re-detecting on the treated corpus finds nothing (one-pass
    convergence when each span has one survivor)."""
    s = " ".join(f"t{i}" for i in range(13))
    docs = [(1, s + " x"), (2, "y " + s), (3, s + " z1 z2")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = zd.duplicate_spans(df, k=8, min_len=12)
    treated = zd.remove_duplicate_spans(df, spans).select("doc_id", "text")
    assert zd.duplicate_spans(treated, k=8, min_len=12).count() == 0


def test_duplicate_spans_cross_corpus_decontamination(spark):
    """`against=` mode: spans come only from benchmark x corpus
    matches (never corpus-internal ones), and the removal treatment
    cuts the corpus side while the benchmark stays whole."""
    bench_span = " ".join(f"b{i}" for i in range(13))
    corpus_span = " ".join(f"c{i}" for i in range(13))  # corpus-internal dup
    bench = spark.createDataFrame(
        [(1000, "q " + bench_span)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, bench_span + " tail1"),       # leaks the benchmark span
            (2, corpus_span + " x"),           # internal dup pair (2,3):
            (3, "y " + corpus_span),           # must NOT appear in cross mode
        ],
        "doc_id long, text string",
    )
    spans = zd.duplicate_spans(corpus, k=8, min_len=12, against=bench)
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
        for r in spans.collect()
    }
    assert got == {(1000, 1, 1, 0, 13)}
    treated = {
        r.doc_id: (r.text, r.removed_tokens)
        for r in zd.remove_duplicate_spans(corpus, spans).collect()
    }
    assert treated[1] == ("tail1", 13)       # benchmark span cut
    assert treated[2][1] == 0 and treated[3][1] == 0  # internal dups kept
