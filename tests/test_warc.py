"""WARC source: writer/reader round-trip, streaming member parse,
HTML→text extraction, and the cross-engine regex mirror.

Reference note: the reference engine has no crawl-archive ingest
(Kafka only, fifo/consumer.go) — this is the beyond-parity Common
Crawl entry point of the LLM pipeline; correctness is pinned by
byte-exact round-trips and a DuckDB replay of the text extraction.
"""

from __future__ import annotations

import gzip

import pytest

from zinger_spark.sources import warc as W

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs():
    return [
        {
            "uri": f"https://example.org/doc/{i}",
            "body": (
                "<html><head><title>T%d</title>"
                "<style>p { color: red }</style>"
                "<script>var x = '<p>not text</p>';</script></head>"
                "<body><!-- nav --><p>alpha&nbsp;beta &amp; gamma %d</p>"
                "<div>tail&lt;x&gt;</div></body></html>" % (i, i)
            ).encode(),
        }
        for i in range(25)
    ]


def _read_rows(spark, path):
    df = W.read_warc(spark, [path])
    return sorted(
        df.select("record_index", "target_uri", "http_status",
                  "http_content_type", "body").collect(),
        key=lambda r: r.record_index,
    )


def test_roundtrip_per_record_members(spark, tmp_path, docs):
    p = str(tmp_path / "cc.warc.gz")
    n = W.write_warc_gz(p, docs, per_record_members=True)
    assert n == 25
    rows = _read_rows(spark, p)
    assert len(rows) == 25
    for i, r in enumerate(rows):
        assert r.target_uri == docs[i]["uri"]
        assert r.http_status == 200
        assert r.http_content_type.startswith("text/html")
        assert bytes(r.body) == docs[i]["body"]


def test_roundtrip_whole_file_member_and_plain(spark, tmp_path, docs):
    pgz = str(tmp_path / "whole.warc.gz")
    W.write_warc_gz(pgz, docs[:5], per_record_members=False)
    assert [bytes(r.body) for r in _read_rows(spark, pgz)] == [
        d["body"] for d in docs[:5]
    ]
    # uncompressed .warc through the same loop
    praw = str(tmp_path / "plain.warc")
    with open(praw, "wb") as f:
        f.write(gzip.decompress(open(pgz, "rb").read()))
    assert [bytes(r.body) for r in _read_rows(spark, praw)] == [
        d["body"] for d in docs[:5]
    ]


def test_writer_is_deterministic(tmp_path, docs):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    W.write_warc_gz(a, docs)
    W.write_warc_gz(b, docs)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_multi_file_parallel_read(spark, tmp_path, docs):
    paths = []
    for j in range(3):
        p = str(tmp_path / f"part{j}.warc.gz")
        W.write_warc_gz(p, docs[j * 5 : (j + 1) * 5])
        paths.append(p)
    df = W.read_warc(spark, paths)
    assert df.count() == 15
    # one task per file: the path column partitions the work
    assert df.select("path").distinct().count() == 3


def test_record_type_filter(spark, tmp_path, docs):
    p = str(tmp_path / "mixed.warc.gz")
    W.write_warc_gz(p, docs[:3])
    df = W.read_warc(spark, [p], record_types=("request",))
    assert df.count() == 0
    df_all = W.read_warc(spark, [p], record_types=())
    assert df_all.count() == 3


def test_non_http_payload_passthrough(spark, tmp_path):
    p = str(tmp_path / "meta.warc")
    rec = W._warc_record(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:1>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": "https://x/raw",
            "Content-Type": "application/octet-stream",
        },
        b"\x00\x01raw-bytes",
    )
    with open(p, "wb") as f:
        f.write(rec)
    rows = _read_rows(spark, p)
    assert rows[0].http_status is None
    assert bytes(rows[0].body) == b"\x00\x01raw-bytes"


def test_html_to_text_extraction(spark, docs):
    df = spark.createDataFrame(
        [(d["body"].decode(),) for d in docs[:1]], "html string"
    ).select(W.html_to_text(F.col("html")).alias("text"))
    txt = df.first().text
    assert "alpha beta & gamma 0" in txt
    assert "tail<x>" in txt
    assert "T0" in txt
    assert "color" not in txt  # style stripped
    assert "not text" not in txt  # script stripped (incl. nested tags)
    assert "nav" not in txt  # comment stripped
    assert "  " not in txt  # whitespace collapsed


def test_html_to_text_matches_duckdb_mirror(spark, docs):
    import duckdb

    htmls = [d["body"].decode() for d in docs]
    got = (
        spark.createDataFrame([(h,) for h in htmls], "html string")
        .select(W.html_to_text(F.col("html")).alias("t"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE h(html VARCHAR)")
    con.executemany("INSERT INTO h VALUES (?)", [(h,) for h in htmls])
    want = con.execute(
        f"SELECT {W.sql_html_to_text('html')} FROM h"
    ).fetchall()
    assert [r.t for r in got] == [w[0] for w in want]


def test_cli_warc_load_into_pool(spark, tmp_path, docs):
    """zync-spark warc-load: crawl archives land in a pool as envelope
    rows with dense per-topic offsets continuing the producer
    watermark — a second load of MORE files appends at the next
    offset, never overlaying."""
    from zinger_spark.cli import main
    from zinger_spark.sources.pool import Pool

    lake = tmp_path / "lake"
    lake.mkdir()
    Pool.create(spark, str(lake / "crawl"))
    p1 = str(tmp_path / "a.warc.gz")
    W.write_warc_gz(p1, docs[:4])
    rc = main(
        ["warc-load", p1, "--pool", "crawl", "--lake", str(lake),
         "--topic", "cc", "--extract-text"]
    )
    assert rc == 0
    pool = Pool(spark, str(lake / "crawl"))
    rows = sorted(
        (r["kafka"]["offset"], r["value"]["uri"], r["value"]["text"])
        for r in pool.df().collect()
    )
    assert [r[0] for r in rows] == [0, 1, 2, 3]  # dense from 0
    assert rows[0][1] == docs[0]["uri"]
    assert "alpha beta & gamma 0" in rows[0][2]  # extraction applied
    # second load continues the watermark
    p2 = str(tmp_path / "b.warc.gz")
    W.write_warc_gz(p2, docs[4:6])
    assert main(
        ["warc-load", p2, "--pool", "crawl", "--lake", str(lake),
         "--topic", "cc", "--extract-text"]
    ) == 0
    offs = sorted(r["kafka"]["offset"] for r in pool.df().collect())
    assert offs == [0, 1, 2, 3, 4, 5]
    assert pool.df().count() == 6


def test_streaming_member_iterator_bounded(tmp_path, docs):
    # the reader must yield member-by-member, not concatenate: 25
    # members in, 25 yields out
    p = str(tmp_path / "m.warc.gz")
    W.write_warc_gz(p, docs)
    with open(p, "rb") as f:
        members = list(W._iter_gzip_members(f))
    assert len(members) == 25
    for m in members:
        assert m.lstrip(b"\r\n").startswith(b"WARC/1.0")


def test_registered_domain_suffix_aware(spark):
    """eTLD+1: last 2 labels normally, last 3 over a two-level public
    suffix; bare domains and short hosts pass through."""
    from zinger_spark.functions.net import registered_domain

    cases = [
        ("www.texthub.com", "texthub.com"),
        ("cdn.blog.co.uk", "blog.co.uk"),
        ("a.b.paper.ac.uk", "paper.ac.uk"),
        ("archive.org", "archive.org"),
        ("co.uk", "co.uk"),          # the suffix itself: nothing to cut
        ("localhost", "localhost"),
        ("deep.sub.mirror.com", "mirror.com"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r.d for r in df.select(registered_domain(F.col("host")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_warc_url_filter_blocklist(spark):
    """The URL-curation key flags exactly the blocklisted registered
    domains, and every fixture record lands in some domain bucket."""
    import __spark_entry__ as m

    df = m.queries()["warc_url_filter"](spark, "/root/testdata/sf0.001")
    rows = {r.domain: (r.n_docs, r.blocked) for r in df.collect()}
    assert sum(n for n, _ in rows.values()) == 500  # sf0.001 documents
    blocked = {d for d, (_, b) in rows.items() if b}
    assert blocked == {"spamfarm.biz", "adsite.com", "track.co.uk"}


def test_malformed_warc_raises(tmp_path):
    """A blob that is not a WARC record must raise, not silently parse
    garbage; a truncated gzip member must raise, not yield a partial
    record."""
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")
    with pytest.raises(ValueError, match="not a WARC record"):
        list(W._parse_records(bad.read_bytes()))
    import gzip as _g

    blob = _g.compress(b"WARC/1.0\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
    trunc = tmp_path / "t.warc.gz"
    trunc.write_bytes(blob[: len(blob) // 2])
    with open(trunc, "rb") as f:
        with pytest.raises(ValueError, match="truncated gzip"):
            list(W._iter_gzip_members(f))


def test_link_graph_extraction(spark, tmp_path):
    """Empty-anchor outlinks are recovered from raw bytes via
    regexp_extract_all and cut to eTLD+1; the tag-strip extraction is
    INVARIANT to them (tags collapse to whitespace)."""
    from pyspark.sql import functions as F

    from zinger_spark.functions import net as znet

    html = (
        b'<html><body><p>hello world</p>'
        b'<a href="https://cdn.blog.co.uk/ref/1-0"></a>'
        b'<a href="https://www.wiki.net/ref/1-1"></a>'
        b"<script>var n=1;</script></body></html>"
    )
    p = str(tmp_path / "one.warc.gz")
    W.write_warc_gz(p, [{"uri": "https://m.texthub.com/p0/1", "body": html}])
    raw = W.read_warc(spark, [p])
    hrefs = F.regexp_extract_all(
        F.col("body").cast("string"), F.lit(r'(?is)<a\s+href="([^"]*)"'), F.lit(1)
    )
    row = raw.select(
        znet.registered_domain(
            znet.parse_uri(F.col("target_uri")).getField("host")
        ).alias("src"),
        hrefs.alias("links"),
        W.html_to_text(F.col("body").cast("string")).alias("text"),
    ).collect()[0]
    assert row.src == "texthub.com"
    assert row.links == [
        "https://cdn.blog.co.uk/ref/1-0",
        "https://www.wiki.net/ref/1-1",
    ]
    # extraction unaffected by the empty anchors
    assert row.text == "hello world"
    dsts = spark.createDataFrame([(u,) for u in row.links], "href string").select(
        znet.registered_domain(znet.parse_uri(F.col("href")).getField("host")).alias("d")
    )
    assert [r.d for r in dsts.collect()] == ["blog.co.uk", "wiki.net"]
