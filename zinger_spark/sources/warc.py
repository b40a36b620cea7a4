"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingest path.

Beyond-reference: the reference engine ingests Kafka topics only
(``cmd/zync``, ``fifo/consumer.go``); a 100-TB LLM training-data
pipeline starts one step earlier, at the raw web crawl.  Common Crawl
publishes ~64k ``.warc.gz`` files per monthly crawl, each ~1 GiB of
per-record gzip members.  This module turns those files into a
documents DataFrame.

Scale design (local[32] and a 1000-executor cluster alike):

- **Parallelism = #files, streaming within a file.**  The reader takes
  a *path list* and fans it out with one task per file
  (``repartition(n_files)``), NOT ``spark.read.format("binaryFile")``
  — binaryFile materializes the whole (possibly 1 GiB) file as one row
  and ships it through an Arrow batch.  Inside the task the file is
  read through a bounded-memory streaming loop: per-record gzip
  members are inflated one at a time (``zlib.decompressobj`` +
  ``unused_data`` chaining, the standard CC layout), so peak memory is
  one *record*, not one *file*.  A whole-file gzip (single member) and
  an uncompressed ``.warc`` degrade gracefully through the same loop.
- **Arrow-batched output.**  The parse kernel is ``mapInPandas``
  yielding bounded record batches (``batch_rows``), the legitimate
  pandas-UDF case: byte-format parsing Spark expressions cannot do.
- **Everything downstream is JVM.**  HTML→text extraction
  (``html_to_text``) is a chain of built-in ``regexp_replace`` /
  entity decodes — no Python in the hot path — so filter/dedup/quality
  stages run whole-stage-codegen on the extracted text.

The writer half (``write_warc_gz``) exists for fixtures and tests: it
emits spec-conformant WARC/1.0 response records, one gzip member per
record, byte-deterministic for a given input.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CRLF = "\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ]
)


# ---------------------------------------------------------------- writer


def _warc_record(headers: dict[str, str], payload: bytes) -> bytes:
    head = "WARC/1.0" + CRLF
    head += "".join(f"{k}: {v}{CRLF}" for k, v in headers.items())
    head += f"Content-Length: {len(payload)}{CRLF}{CRLF}"
    return head.encode("utf-8") + payload + (CRLF * 2).encode()


def http_response_payload(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "")
    head = (
        f"HTTP/1.1 {status} {reason}{CRLF}"
        f"Content-Type: {content_type}{CRLF}"
        f"Content-Length: {len(body)}{CRLF}{CRLF}"
    )
    return head.encode("utf-8") + body


def write_warc_gz(
    path: str,
    records: Iterable[dict],
    per_record_members: bool = True,
) -> int:
    """Write WARC/1.0 response records; one gzip member per record
    (the Common Crawl layout) or one whole-file member.

    Each record dict: ``uri``, ``body`` (bytes), optional ``date``,
    ``status``, ``content_type``, ``record_id``.  Deterministic for a
    given input (fixed mtime in the gzip header), so fixtures built
    from a testdata table are byte-stable across runs.
    """
    n = 0
    raw = io.BytesIO()
    out: io.BufferedIOBase
    if per_record_members:
        sink = open(path, "wb")
    else:
        sink = None
        out = raw
    try:
        for i, rec in enumerate(records):
            payload = http_response_payload(
                rec["body"],
                status=rec.get("status", 200),
                content_type=rec.get("content_type", "text/html; charset=utf-8"),
            )
            headers = {
                "WARC-Type": "response",
                "WARC-Record-ID": rec.get(
                    "record_id", f"<urn:uuid:{i:032x}>"
                ),
                "WARC-Date": rec.get("date", "2026-01-01T00:00:00Z"),
                "WARC-Target-URI": rec["uri"],
                "Content-Type": "application/http; msgtype=response",
            }
            blob = _warc_record(headers, payload)
            if per_record_members:
                member = io.BytesIO()
                with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
                    gz.write(blob)
                sink.write(member.getvalue())
            else:
                out.write(blob)
            n += 1
        if not per_record_members:
            with open(path, "wb") as f:
                with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(raw.getvalue())
    finally:
        if sink is not None:
            sink.close()
    return n


# ---------------------------------------------------------------- reader


def _iter_gzip_members(f: io.BufferedIOBase, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Inflate a multi-member gzip stream one member at a time.

    Memory is bounded by the largest single member (one WARC record in
    the CC layout), never the whole file.  A single-member (whole-file)
    gzip yields once with the full stream — the degenerate case.
    """
    buf = b""
    while True:
        if not buf:
            buf = f.read(chunk)
            if not buf:
                return
        d = zlib.decompressobj(wbits=31)
        parts = [d.decompress(buf)]
        while not d.eof:
            more = f.read(chunk)
            if not more:
                break
            parts.append(d.decompress(more))
        if not d.eof:
            raise ValueError("truncated gzip member")
        yield b"".join(parts)
        buf = d.unused_data


def _iter_plain(f: io.BufferedIOBase) -> Iterator[bytes]:
    yield f.read()


def _parse_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Parse concatenated WARC records from one inflated blob."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split(CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record header at byte {pos}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs.get("content-length", "0"))
        body_start = head_end + 4
        payload = blob[body_start : body_start + length]
        yield hdrs, payload
        pos = body_start + length


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an application/http payload into (status, content-type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].decode("utf-8", "replace")
    lines = head.split(CRLF)
    status = None
    ctype = None
    first = lines[0].split(" ")
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, payload[sep + 4 :]


def read_warc(
    spark: SparkSession,
    paths: list[str],
    record_types: tuple[str, ...] = ("response",),
    batch_rows: int = 256,
) -> DataFrame:
    """Streaming WARC reader: one task per file, one record in memory
    at a time, Arrow-batched output (schema ``WARC_SCHEMA``)."""
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    want = set(record_types)

    def parse(batches):
        import pandas as pd

        def flush(rows):
            return pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_SCHEMA.fields],
            )

        for pb in batches:
            for path in pb["path"]:
                rows = []
                with open(path, "rb") as f:
                    magic = f.read(2)
                    f.seek(0)
                    members = (
                        _iter_gzip_members(f)
                        if magic == b"\x1f\x8b"
                        else _iter_plain(f)
                    )
                    idx = 0
                    for blob in members:
                        for hdrs, payload in _parse_records(blob):
                            wtype = hdrs.get("warc-type", "")
                            i = idx
                            idx += 1
                            if want and wtype not in want:
                                continue
                            status, ctype, body = _parse_http(payload)
                            rows.append(
                                (
                                    path,
                                    i,
                                    wtype,
                                    hdrs.get("warc-record-id"),
                                    hdrs.get("warc-target-uri"),
                                    hdrs.get("warc-date"),
                                    status,
                                    ctype,
                                    bytes(body),
                                )
                            )
                            if len(rows) >= batch_rows:
                                yield flush(rows)
                                rows = []
                if rows:
                    yield flush(rows)

    return pdf.repartition(max(len(paths), 1)).mapInPandas(parse, WARC_SCHEMA)


# ------------------------------------------------------- HTML -> text


# &amp; decodes LAST: "&amp;lt;" must yield "&lt;", not double-decode
# to "<"; the SQL mirror applies the same order so both engines agree
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Boilerplate HTML→text as pure JVM expressions (no Python in the
    hot path): drop script/style/comment blocks, strip tags, decode the
    six dominant entities, collapse whitespace.

    A heuristic extractor, not a DOM parser — the same tradeoff the
    public CC pipelines make for the first text cut; downstream quality
    filters (Gopher pack, lang-id) absorb the noise.  Each step is one
    ``regexp_replace``, so the whole chain stays in one codegen stage.
    """
    # two separate block rules, not one `<(script|style)...</\1>` with a
    # backreference: the oracle mirror runs on RE2 (DuckDB), which has
    # no backreferences, and both engines must apply the SAME regex
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def sql_html_to_text(expr: str) -> str:
    """The DuckDB mirror of ``html_to_text`` (oracle parity)."""
    t = f"regexp_replace({expr}, '(?is)<script\\b.*?</script>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?is)<style\\b.*?</style>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{lit}')"
    t = f"regexp_replace({t}, '\\s+', ' ', 'g')"
    return f"trim({t})"
