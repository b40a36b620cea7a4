"""Round-9 additions: directional n-gram containment, reciprocal-rank
fusion, and canonical-URL normalization.

All three are beyond-reference LLM-curation operators (the reference —
brimdata/zinger — delegates query work to a Zed lake, fifo/lake.go);
each also runs under the DuckDB hash-exact oracle via its registry key
(dedup_ngram_containment, rrf_hybrid_topk, url_dedup_canonical)."""

from pyspark.sql import functions as F

from zinger_spark.functions.net import canonical_url
from zinger_spark.operators.dedup import ngram_containment_pairs
from zinger_spark.operators.similarity import rrf_fuse


def test_containment_detects_subset_quote(spark):
    # doc 2 is a verbatim quote of doc 1's middle: containment from the
    # short side ~1.0 while jaccard is far below any dedup threshold
    long_text = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 30))
    df = spark.createDataFrame(
        [(1, long_text), (2, quote), (3, "completely different words here x y z a b c")],
        "doc_id long, text string",
    )
    out = ngram_containment_pairs(df, shingle_k=5, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # shingles(doc2) = 6 five-grams, all present in doc1
    assert r.containment_ba == 1.0
    assert r.containment_ab < 0.2


def test_containment_threshold_is_either_direction(spark):
    a = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, a), (2, a)], "doc_id long, text string"
    )
    out = ngram_containment_pairs(df, shingle_k=5, threshold=0.99).collect()
    assert len(out) == 1
    assert out[0].containment_ab == 1.0 and out[0].containment_ba == 1.0


def test_rrf_fuse_ranks_and_missing_ids(spark):
    run_a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    run_b = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank int"
    )
    out = {r.doc_id: r for r in rrf_fuse([run_a, run_b], topk=10).collect()}
    # doc 11 appears in both runs -> highest fused score
    assert out[11].rank == 1
    assert out[11].rrf_score == round(1 / 62 + 1 / 61, 8)
    # absent ranks surface as 0, not NULL
    assert out[10].rank_1 == 0
    assert out[13].rank_0 == 0
    assert out[10].rrf_score == round(1 / 61, 8)
    # deterministic tie-break: 10 (rank1 in A only) vs 13 (rank2 in B only)
    assert out[10].rank < out[13].rank


def test_rrf_fuse_topk_bounds_output(spark):
    run = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_id long, rank int"
    )
    got = rrf_fuse([run, run.limit(0)], topk=5).collect()
    assert [r.doc_id for r in got] == [0, 1, 2, 3, 4]
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]


def test_canonical_url_normalizations(spark):
    cases = [
        # case + default https port + param order
        ("HTTPS://WWW.Example.COM:443/a/b?z=1&a=2", "https://www.example.com/a/b?a=2&z=1"),
        # tracking params stripped (utm_ prefix + exact keys), fragment dropped
        ("https://x.com/p?utm_source=s&a=1&fbclid=f&b=2#frag", "https://x.com/p?a=1&b=2"),
        # http default port, trailing slash, empty path
        ("http://x.com:80/dir/", "http://x.com/dir"),
        ("https://x.com", "https://x.com/"),
        # non-default port and userinfo kept, repeated keys preserved
        ("https://u@x.com:8443/p?b=2&b=1", "https://u@x.com:8443/p?b=1&b=2"),
        # trailing host dot stripped; query that is ALL trackers vanishes
        ("https://x.com./p?gclid=1&utm_medium=m", "https://x.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_idempotent(spark):
    urls = [
        "HTTPS://A.B.com:443/x/?utm_campaign=c&k=v#f",
        "http://plain.org/path?q=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


def test_canonical_url_passthrough_unparseable(spark):
    """Relative references and non-URLs come back unchanged — the
    normalization must not mangle what it cannot parse."""
    cases = ["not a url", "/relative/path?a=1", "mailto:x@y.com", ""]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == cases


def test_rrf_fuse_single_run(spark):
    run = spark.createDataFrame([(7, 1), (9, 2)], "doc_id long, rank int")
    got = rrf_fuse([run], topk=10).collect()
    assert [(r.doc_id, r.rank) for r in got] == [(7, 1), (9, 2)]
    assert got[0].rrf_score == round(1 / 61, 8)


def test_canonical_url_ipv6_passthrough(spark):
    # bracketed IPv6 authorities defeat the host:port split — must pass
    # through verbatim, and two distinct hosts must NOT collapse
    urls = ["https://[2001:db8::1]/x", "https://[2001:db8::2]/x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == urls


def test_incremental_containment_detects_quote_of_corpus(spark):
    """A new doc that is a verbatim excerpt of a corpus doc has high
    containment from the new side — the recrawl subset check that
    exact-fingerprint and symmetric-Jaccard incremental passes miss."""
    from zinger_spark.operators.dedup import incremental_containment_dups

    corpus_text = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 30))
    corpus = spark.createDataFrame(
        [(1, corpus_text), (2, "unrelated corpus text a b c d e f")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, quote), (11, "fresh novel content x y z q r s")],
        "doc_id long, text string",
    )
    got = incremental_containment_dups(corpus, new, shingle_k=5, threshold=0.9).collect()
    assert len(got) == 1
    assert (got[0].new_id, got[0].corpus_id) == (10, 1)
    assert got[0].containment == 1.0
