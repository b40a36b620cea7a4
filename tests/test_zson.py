"""ZSON codec: the reference's native text format, exercised against
the reference's own corpus.

- parse/dumps round-trips over demo/*.zson (every ZSON file the
  reference ships)
- read_zson: distributed load of batch files (the `zed load` analog,
  ztests/etl-demo.yaml:8)
- zson_line: JVM-side compact-ZSON egress reproducing the
  `zed query -z` golden shape (etl-demo.yaml:30-37)
- the full 4-batch invoices demo driven END-TO-END from the .zson
  files: reference text in, reference golden records out.
"""

from __future__ import annotations

import json
import math
import pathlib
import re

import pytest

from zinger_spark.codecs import zson

DEMO = pathlib.Path("/root/reference/demo")
ZTEST = pathlib.Path("/root/reference/ztests/etl-demo.yaml")

pytestmark = pytest.mark.skipif(
    not DEMO.exists(), reason="reference corpus not present"
)


# -------------------------------------------------------------- parser


def test_parse_reference_corpus():
    counts = {}
    for p in sorted(DEMO.glob("*.zson")):
        vals = zson.parse(p.read_text())
        counts[p.name] = len(vals)
        # round-trip every value through the compact printer
        for v, name in vals:
            (v2, name2), = zson.parse(zson.dumps(v, name))
            assert v2 == v and name2 == name, p.name
    assert counts == {
        "batch-1.zson": 4,
        "batch-2.zson": 3,
        "batch-3.zson": 2,
        "batch-4.zson": 3,
        "consume-1.zson": 3,
        "consume-2.zson": 1,
        "staging-1.zson": 2,
    }


def test_parse_batch1_first_record():
    (v, name), *_ = zson.parse((DEMO / "batch-1.zson").read_text())
    assert name is None
    assert v == {
        "kafka": {"topic": "Invoices", "offset": 1},
        "key": {"ID": 100},
        "value": {"op": "r", "after": {"ID": 100, "customer": "Alice", "item": "taco"}},
    }


def test_parse_named_type_and_trailing_commas():
    vals = zson.parse((DEMO / "staging-1.zson").read_text())
    assert vals[1] == ({"seqno": 2}, "cursor")


def test_parse_scalars_and_decorators():
    text = """
    // comment
    {ts:2021-03-01T12:34:56.123Z, n:-3, f:2.5e3, b:true, z:null,
     raw:0xdeadbeef, small:7(uint8), fl:1(float64),
     arr:[1,2,3], m:|{"k":42}|, s:|["a","b"]|} /* trailing */
    """
    (v, name), = zson.parse(text)
    assert v["ts"] == "2021-03-01T12:34:56.123Z"
    assert v["f"] == 2500.0 and isinstance(v["fl"], float) and v["fl"] == 1.0
    assert v["raw"] == "0xdeadbeef" and v["small"] == 7
    assert v["m"] == zson.ZsonMap({"k": 42})
    assert isinstance(v["s"], zson.ZsonSet)
    assert name is None


def test_dumps_escapes_and_floats():
    assert zson.dumps({"s": 'a"b\n'}) == '{s:"a\\"b\\n"}'
    assert zson.dumps(1.0) == "1.0"
    assert zson.dumps(float("nan")) == "NaN"
    assert zson.dumps(float("-inf")) == "-Inf"
    v, _ = zson.parse(zson.dumps(float("nan")))[0]
    assert math.isnan(v)
    # non-identifier field names are quoted
    assert zson.dumps({"a b": 1}) == '{"a b":1}'
    (rt, _), = zson.parse('{"a b":1}')
    assert rt == {"a b": 1}


def test_parse_errors():
    for bad in ("{a:}", '{"unterminated', "{a:1", "[1,", "{a 1}", "(=x)"):
        with pytest.raises(zson.ZsonError):
            zson.parse(bad)


# -------------------------------------------------------------- spark


def test_read_zson_batch1(spark):
    df = zson.read_zson(spark, str(DEMO / "batch-1.zson"))
    rows = {
        (r["kafka"]["topic"], r["kafka"]["offset"]): r
        for r in (x.asDict(recursive=True) for x in df.collect())
    }
    assert len(rows) == 4
    assert rows[("Invoices", 1)]["value"]["after"]["customer"] == "Alice"
    assert rows[("InvoiceStatus", 2)]["value"]["after"]["InvoiceID"] == 100
    # ints infer as long, heterogeneous values fuse with nulls
    assert rows[("Invoices", 1)]["value"]["after"]["InvoiceID"] is None


def test_read_zson_type_field(spark):
    df = zson.read_zson(spark, str(DEMO / "staging-1.zson"), type_field="_type")
    got = {r["_type"] for r in df.collect()}
    assert got == {"data", "cursor"}


def test_read_zson_many_files_bounded_driver_fold(spark, tmp_path):
    """Schema inference over MANY files: the per-file schemas fold
    distributedly (range-partitioned by path, <= 32 partials reach the
    driver), and the result is byte-identical to a sequential
    path-ordered merge — first-seen field order across ascending file
    paths, heterogeneous fields fused with nulls."""
    n = 120
    for i in range(n):
        # zero-padded names: path order == numeric order
        extra = f", x{i % 7}: {i}" if i % 3 == 0 else ""
        (tmp_path / f"f{i:04d}.zson").write_text(
            f"{{id: {i}, name: \"d{i}\"{extra}}}\n"
        )
    df = zson.read_zson(spark, str(tmp_path / "*.zson"))
    assert df.count() == n
    # field order: id/name from file 0, then x0..x6 in first-seen
    # (path-ascending) order — x0 (f0000), x3 (f0003), x6, x2, x5, x1, x4
    assert df.columns == ["id", "name", "x0", "x3", "x6", "x2", "x5", "x1", "x4"]
    got = {r["id"]: r for r in df.collect()}
    assert got[0]["x0"] == 0 and got[0]["x3"] is None
    assert got[99]["x1"] == 99  # 99 % 3 == 0, 99 % 7 == 1
    assert got[1]["name"] == "d1" and got[1]["x0"] is None


def test_zson_line_golden_shape(spark):
    """Load staging-1.zson and print it back: with order-preserving
    inference (r11) the round trip reproduces the reference's own
    compact text verbatim, field order included."""
    df = zson.read_zson(spark, str(DEMO / "staging-1.zson"), type_field="_type")
    lines = {r[0] for r in df.select(zson.zson_line(df)).collect()}
    assert "{seqno:2}(=cursor)" in lines
    assert (
        '{seqno:3,kafka:{topic:"order",offset:1},'
        "row:{customerID:1,menuID:200,qty:2,total:3.98}}" in lines
    )


def test_zson_line_types_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 'say "hi"\n', True, [1, None, 3], {"k": 7},
          bytes([222, 173]), (None, "z"))],
        "i long, f double, s string, b boolean, arr array<long>, "
        "m map<string,long>, raw binary, nested struct<x:string,y:string>",
    )
    line = df.select(zson.zson_line(df, type_col=None, drop_nulls=False)).collect()[0][0]
    (v, name), = zson.parse(line)
    assert name is None
    assert v["i"] == 1 and v["f"] == 2.0 and v["b"] is True
    assert v["s"] == 'say "hi"\n'
    assert v["arr"] == [1, None, 3]
    assert v["m"] == zson.ZsonMap({"k": 7})
    assert v["raw"] == "0xdead"
    assert v["nested"] == {"x": None, "y": "z"}


# ---------------------------------------------- end-to-end demo parity


def _golden_batches() -> list[list[tuple[dict, str | None]]]:
    """The `zed query -z 'from Staging'` record lines per batch from the
    reference ztest (ztests/etl-demo.yaml outputs.stdout), parsed."""
    text = ZTEST.read_text()
    stdout = text.split("data: |", 1)[1]
    batches: list[list[tuple[dict, str | None]]] = []
    for line in stdout.splitlines():
        line = line.strip()
        if re.fullmatch(r"=== \d+", line):
            batches.append([])
            continue
        if line.startswith("{"):
            batches[-1].append(zson.parse(line)[0])
    assert len(batches) == 4 and all(b for b in batches)
    return batches


def _canon(value: dict, name: str | None) -> str:
    v = json.loads(json.dumps(value))  # deep copy
    if isinstance(v.get("kafka"), dict):
        v["kafka"].pop("partition", None)  # reference envelopes carry no partition
    return json.dumps({"_name": name or "data", **v}, sort_keys=True)


def test_etl_demo_from_zson_files_matches_goldens(spark, tmp_path):
    """The complete reference workflow driven from its own files: load
    demo/batch-N.zson -> run demo/invoices.yaml (verbatim) -> print
    Staging as compact ZSON -> compare against the etl-demo.yaml golden
    output, batch by batch."""
    from test_etl_demo import make_transform_zed

    from zinger_spark.etl.planner import EtlPipeline
    from zinger_spark.sources.pool import Pool

    raw = Pool.create(spark, str(tmp_path / "Raw"))
    staging = Pool.create(spark, str(tmp_path / "Staging"))
    pools = {"Raw": raw, "Staging": staging}
    pipeline = EtlPipeline(spark, make_transform_zed(), lambda n: pools[n])

    for i, golden in enumerate(_golden_batches(), start=1):
        batch = zson.read_zson(
            spark, str(DEMO / f"batch-{i}.zson"), type_field="_type"
        )
        raw.load_batch(batch)
        pipeline.run()
        df = staging.df()
        ours = [
            zson.parse(r[0])[0]
            for r in df.select(zson.zson_line(df)).collect()
        ]
        assert sorted(_canon(*x) for x in ours) == sorted(
            _canon(*x) for x in golden
        ), f"batch {i}"


def test_ztest_script_replay_through_cli(spark, tmp_path, capsys, monkeypatch):
    """The reference ztest script (ztests/etl-demo.yaml:1-12) replayed
    command for command through THIS CLI: create pools, `load` each
    demo batch-N.zson, run `etl` on the reference's own invoices.yaml,
    and print Staging with `query -Z` — comparing the ZSON records
    against the ztest's golden stdout, batch by batch."""
    from zinger_spark import cli as climod

    monkeypatch.setattr(climod, "_spark", lambda args: spark)
    lake = str(tmp_path)
    assert climod.main(["create-pool", "Raw", "--lake", lake]) == 0
    assert climod.main(["create-pool", "Staging", "--lake", lake]) == 0
    capsys.readouterr()
    for i, golden in enumerate(_golden_batches(), start=1):
        assert climod.main(
            ["load", str(DEMO / f"batch-{i}.zson"),
             "--pool", "Raw@main", "--lake", lake]
        ) == 0
        assert climod.main(
            ["etl", str(DEMO / "invoices.yaml"), "--lake", lake]
        ) == 0
        assert climod.main(
            ["query", "--lake", lake, "-Z", "-z", "from Staging"]
        ) == 0
        out = capsys.readouterr().out
        ours = [
            zson.parse(line)[0]
            for line in out.splitlines()
            if line.startswith("{")
        ]
        assert sorted(_canon(*x) for x in ours) == sorted(
            _canon(*x) for x in golden
        ), f"batch {i}"
