"""Dedup-index lifecycle CLI: `index build/update/merge --kind
minhash|winnow|url` — the daily-batch operator workflow.  The two-batch
round trips must match the in-process incremental operators exactly
(same pairs, same maintained index contents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zinger_spark import cli as climod
from zinger_spark.operators import dedup as zdd


@pytest.fixture()
def docs(spark):
    # small corpus with real near-dups: pairs of near-identical texts
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "a completely different document about spark query planning",
        "numbers one two three four five six seven eight nine ten",
    ]
    rows = []
    for i in range(24):
        t = base[i % 4]
        if i >= 12:
            t = t + " extra"  # near-dup of its base, not exact
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _split(docs, tmp_path):
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    cp, bp = str(tmp_path / "corpus.pq"), str(tmp_path / "batch.pq")
    corpus.write.parquet(cp)
    batch.write.parquet(bp)
    return corpus, batch, cp, bp


def test_index_cli_minhash_two_batch_round_trip(spark, tmp_path, docs, monkeypatch, capsys):
    monkeypatch.setattr(climod, "_spark", lambda a: spark)
    corpus, batch, cp, bp = _split(docs, tmp_path)
    idx = str(tmp_path / "mh_idx")
    pairs_out = str(tmp_path / "pairs.pq")

    assert climod.main(
        ["index", "build", "--kind", "minhash", "--index", idx,
         "--input", cp, "--shingle-k", "3"]
    ) == 0
    assert climod.main(
        ["index", "update", "--kind", "minhash", "--index", idx,
         "--input", bp, "--pairs-out", pairs_out, "--shingle-k", "3",
         "--jaccard", "0.5"]
    ) == 0

    # in-process reference: same build + incremental probe
    ref_index = zdd.build_minhash_index(corpus, shingle_k=3)
    ref_pairs, ref_new = zdd.incremental_minhash_pairs(
        ref_index, batch, shingle_k=3, jaccard_threshold=0.5
    )
    got = {tuple(r) for r in spark.read.parquet(pairs_out).collect()}
    want = {tuple(r) for r in ref_pairs.collect()}
    assert got == want and want  # non-degenerate: real pairs exist

    # maintained index now equals corpus+batch built from scratch
    stored = zdd.load_minhash_index(spark, idx)
    full = zdd.build_minhash_index(docs, shingle_k=3)
    for name in ("bands", "sizes"):
        assert {tuple(r) for r in stored[name].collect()} == {
            tuple(r) for r in full[name].collect()
        }, name


def test_index_cli_winnow_update_and_merge(spark, tmp_path, docs, monkeypatch):
    monkeypatch.setattr(climod, "_spark", lambda a: spark)
    corpus, batch, cp, bp = _split(docs, tmp_path)
    idx = str(tmp_path / "wn_idx")
    pairs_out = str(tmp_path / "wpairs.pq")

    assert climod.main(
        ["index", "build", "--kind", "winnow", "--index", idx, "--input", cp]
    ) == 0
    assert climod.main(
        ["index", "update", "--kind", "winnow", "--index", idx,
         "--input", bp, "--pairs-out", pairs_out, "--min-shared", "3"]
    ) == 0
    ref = zdd.incremental_substring_dups(corpus, batch, min_shared=3)
    got = {tuple(r) for r in spark.read.parquet(pairs_out).collect()}
    assert got == {tuple(r) for r in ref.collect()} and got

    # merge: a second index dir folds in (running-union semantics)
    idx2 = str(tmp_path / "wn_idx2")
    assert climod.main(
        ["index", "build", "--kind", "winnow", "--index", idx2, "--input", bp]
    ) == 0
    assert climod.main(
        ["index", "merge", "--kind", "winnow", "--index", idx, "--other", idx2]
    ) == 0
    stored = spark.read.parquet(f"{idx}/fps")
    full = zdd.winnow_fingerprints(docs)
    # idx had corpus + batch(update) + batch(merge) => batch fps twice;
    # distinct-compare (the probe joins are set-semantics anyway)
    assert {tuple(r) for r in stored.distinct().collect()} == {
        tuple(r) for r in full.distinct().collect()
    }


def test_index_cli_url_frontier_two_batches(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(climod, "_spark", lambda a: spark)
    mk = lambda i, u: (i, u)
    corpus = spark.createDataFrame(
        [mk(1, "https://a.com/x?utm_source=z"), mk(2, "https://b.com/y")],
        "doc_id bigint, url string",
    )
    b1 = spark.createDataFrame(
        [mk(10, "https://A.com/x/"), mk(11, "https://c.com/new")],
        "doc_id bigint, url string",
    )
    b2 = spark.createDataFrame(
        [mk(20, "https://c.com/new?utm_x=1"), mk(21, "https://d.com/d")],
        "doc_id bigint, url string",
    )
    cp = str(tmp_path / "c.pq"); corpus.write.parquet(cp)
    p1 = str(tmp_path / "b1.pq"); b1.write.parquet(p1)
    p2 = str(tmp_path / "b2.pq"); b2.write.parquet(p2)
    idx = str(tmp_path / "url_idx")
    out1, out2 = str(tmp_path / "adm1.pq"), str(tmp_path / "adm2.pq")

    base = ["index", "--kind", "url", "--index", idx, "--url-col", "url"]
    assert climod.main(["index", "build", "--kind", "url", "--index", idx,
                        "--input", cp, "--url-col", "url"]) == 0
    assert climod.main(["index", "update", "--kind", "url", "--index", idx,
                        "--input", p1, "--url-col", "url",
                        "--pairs-out", out1]) == 0
    # a.com/x canonicalizes onto the corpus URL -> rejected; c.com/new admitted
    adm1 = {r["canon_url"] for r in spark.read.parquet(out1).collect()}
    assert adm1 == {"https://c.com/new"}
    assert climod.main(["index", "update", "--kind", "url", "--index", idx,
                        "--input", p2, "--url-col", "url",
                        "--pairs-out", out2]) == 0
    # c.com/new was admitted by batch 1 -> now in the index -> rejected
    adm2 = {r["canon_url"] for r in spark.read.parquet(out2).collect()}
    assert adm2 == {"https://d.com/d"}


def test_index_cli_embedding_two_batch_round_trip(spark, tmp_path, monkeypatch):
    """--kind embedding: the maintained (id, v, nv, bucket) index; the
    two-batch probe matches the in-process incremental operator and the
    stored layout stays bucket-partitioned (probe pruning)."""
    import os

    from zinger_spark.operators.similarity import incremental_embedding_dups

    monkeypatch.setattr(climod, "_spark", lambda a: spark)
    # vectors with real near-dups: pairs i and i+100 nearly parallel
    df = spark.range(40).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 7), j -> CAST(sin((id % 20) * 3 + j) "
        "+ CASE WHEN id >= 20 THEN 0.001 * j ELSE 0.0 END AS DOUBLE)) AS embedding",
    )
    corpus = df.filter("vec_id < 20")
    batch = df.filter("vec_id >= 20")
    cp, bp = str(tmp_path / "c.pq"), str(tmp_path / "b.pq")
    corpus.write.parquet(cp)
    batch.write.parquet(bp)
    idx = str(tmp_path / "emb_idx")
    out = str(tmp_path / "epairs.pq")

    assert climod.main(
        ["index", "build", "--kind", "embedding", "--index", idx,
         "--input", cp, "--id-col", "vec_id", "--cosine", "0.99"]
    ) == 0
    assert os.path.isdir(f"{idx}/vectors") and any(
        d.startswith("bucket=") for d in os.listdir(f"{idx}/vectors")
    )
    assert climod.main(
        ["index", "update", "--kind", "embedding", "--index", idx,
         "--input", bp, "--pairs-out", out, "--id-col", "vec_id",
         "--cosine", "0.99"]
    ) == 0
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {
        tuple(r)
        for r in incremental_embedding_dups(corpus, batch, threshold=0.99).collect()
    }
    assert got == want and got  # non-degenerate
    # index now holds corpus + batch rows
    assert spark.read.parquet(f"{idx}/vectors").count() == 40
