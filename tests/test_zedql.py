"""zedql: the Zed-dialect compiler.

Covers the parser (program shapes from etl/build.go:86-109), the
operator compilers, and an end-to-end run of the reference's full
generated ETL program (the `zync etl -zed` golden text,
ztests/etl-zed.yaml) over batch-1 of the invoices demo
(demo/batch-1.zson), checking the rows the Zed lake would hand back to
pipeline.go's writeToOutputPool."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from zinger_spark.datamodel import fuse
from zinger_spark.zedql import (
    ZedCompileError,
    ZedSyntaxError,
    compile_predicate,
    compile_query,
    compile_rule_seq,
    looks_like_zed,
    zed_transform,
    parse,
    parse_expr_text,
    parse_type,
)
from zinger_spark.zedql import ast


# --------------------------------------------------------------------------
# Parser


def test_parse_type_decl():
    t = parse_type("{kafka:{topic:string,offset:int64}}")
    assert t == T.StructType(
        [
            T.StructField(
                "kafka",
                T.StructType(
                    [
                        T.StructField("topic", T.StringType()),
                        T.StructField("offset", T.LongType()),
                    ]
                ),
            )
        ]
    )


def test_parse_type_collections():
    assert parse_type("[int32]") == T.ArrayType(T.IntegerType())
    assert parse_type("|[string]|") == T.ArrayType(T.StringType())  # set->array
    assert parse_type("|{string:float64}|") == T.MapType(
        T.StringType(), T.DoubleType()
    )


def test_parse_program_shapes():
    p = parse(
        'type done = {kafka:{topic:string,offset:int64}}\n'
        'from (\n'
        '  pool "Raw" => kafka.topic=="Invoices"\n'
        '  pool "Staging" => is(<done>) kafka.topic=="Invoices"\n'
        ') | anti join on kafka.offset=kafka.offset\n'
        '| sort kafka.offset\n'
    )
    assert [d.name for d in p.decls] == ["done"]
    assert [type(o).__name__ for o in p.seq.ops] == ["OpFrom", "OpJoin", "OpSort"]
    legs = p.seq.ops[0].legs
    assert [l.source for l in legs] == ["Raw", "Staging"]
    # implicit-and: is(<done>) kafka.topic=="Invoices"
    (w,) = legs[1].seq.ops
    assert isinstance(w, ast.OpWhere) and isinstance(w.expr, ast.Bin)
    assert w.expr.op == "and" and isinstance(w.expr.left, ast.IsType)


def test_parse_in_is_path_not_operator():
    e = parse_expr_text("in.value.after.ID")
    assert isinstance(e, ast.Path) and e.parts == ["in", "value", "after", "ID"]
    e2 = parse_expr_text('value.op in ["c", "r"]')
    assert isinstance(e2, ast.Bin) and e2.op == "in"


def test_parse_put_vs_summarize():
    p = parse("out.kafka:=in.kafka")
    assert isinstance(p.seq.ops[0], ast.OpPut)
    p2 = parse("n:=count() by kafka.topic")
    assert isinstance(p2.seq.ops[0], ast.OpSummarize)
    assert p2.seq.ops[0].aggs[0].name == "n"


def test_parse_errors():
    with pytest.raises(ZedSyntaxError):
        parse_expr_text("a == ")
    with pytest.raises(ZedSyntaxError):
        parse_expr_text("a = b")  # single = only valid in join-on
    with pytest.raises(ZedSyntaxError):
        parse("from ( pool )")


# --------------------------------------------------------------------------
# Expression + operator compilation


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, "click", 3.0, ["a", "b"], "x"),
            (2, "view", 1.5, ["c"], "y"),
            (3, "click", 9.0, [], "x"),
            (4, "buy", 2.5, None, "y"),
        ],
        "id long, kind string, v double, tags array<string>, grp string",
    )


def run(df, text, **kw):
    return compile_query(df.sparkSession, text, df=df, **kw)


def test_filter_and_in(ev):
    out = run(ev, 'kind in ["click", "buy"] and v > 2.0')
    assert {r.id for r in out.collect()} == {1, 3, 4}


def test_yield_record_literal(ev):
    out = run(ev, "yield {a: id * 2, nested: {k: to_upper(kind)}}")
    rows = out.orderBy("a").collect()
    assert rows[0].a == 2 and rows[0].nested.k == "CLICK"
    # clean (non-pool) inputs don't grow the _type meta column
    assert out.columns == ["a", "nested"]


def test_cut_preserves_nesting(spark):
    df = spark.createDataFrame(
        [((1, "t", 5), "z")], "kafka struct<a:long,topic:string,offset:long>, other string"
    )
    out = run(df, "cut kafka.topic, kafka.offset, other")
    assert out.schema.simpleString() == (
        "struct<kafka:struct<topic:string,offset:bigint>,other:string>"
    )


def test_put_nested_and_drop(spark):
    df = spark.createDataFrame([((1, 2), 9)], "s struct<a:long,b:long>, x long")
    out = run(df, "s.b:=x*10 | put s.c:=1 | drop s.a, x")
    r = out.collect()[0]
    assert r.s.b == 90 and r.s.c == 1
    assert out.columns == ["s"]


def test_sort_head_tail(ev):
    assert [r.id for r in run(ev, "sort -r v | head 2").collect()] == [3, 1]
    assert [r.id for r in run(ev, "sort v | tail 2").collect()] == [1, 3]
    with pytest.raises(ZedCompileError):
        run(ev, "tail 2")  # unordered input


def test_summarize_by(ev):
    out = run(ev, "n:=count(), total:=sum(v) by kind | sort kind")
    rows = [(r.kind, r.n, r.total) for r in out.collect()]
    assert rows == [("buy", 1, 2.5), ("click", 2, 12.0), ("view", 1, 1.5)]


def test_summarize_default_names_and_where(ev):
    out = run(ev, 'count() where kind=="click" by grp | sort grp')
    assert [(r.grp, r["count"]) for r in out.collect()] == [("x", 2), ("y", 0)]


def test_switch_first_match(ev):
    out = run(
        ev,
        "switch ( case v >= 3.0 => yield {id: id, bucket: \"hi\"} "
        "case kind==\"view\" => yield {id: id, bucket: \"view\"} "
        "default => yield {id: id, bucket: \"rest\"} ) | sort id",
    )
    rows = [(r.id, r.bucket) for r in out.collect()]
    # id=1 matches case 1 only; id=2 matches case 2; id=4 falls through
    assert rows == [(1, "hi"), (2, "view"), (3, "hi"), (4, "rest")]


def test_switch_null_predicate_falls_through(spark):
    """A NULL case predicate means "not matched": the row must reach a
    later case or the default, not vanish (3VL: true & ~NULL = NULL)."""
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id long, v double")
    out = run(
        df,
        'switch ( case v > 3.0 => yield {id: id, r: "hi"} '
        'default => yield {id: id, r: "rest"} ) | sort id',
    )
    assert [(r.id, r.r) for r in out.collect()] == [(1, "rest"), (2, "hi")]


def test_fork_fuses_heterogeneous_branches(ev):
    out = run(ev, "fork ( => yield {a: id} => yield {b: kind} )")
    assert set(out.columns) == {"a", "b"}
    assert out.count() == 8


def test_join_with_assignment(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k long, lv string")
    right = spark.createDataFrame([(1, "r1"), (3, "r3")], "k long, rv string")
    out = compile_query(
        spark,
        "fork ( => from L => from R ) | join on k=k right:=rv | sort k",
        tables={"L": left, "R": right},
    )
    rows = [(r.k, r.lv, r.right) for r in out.collect()]
    assert rows == [(1, "l1", "r1")]


def test_anti_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(2,), (9,)], "k long")
    out = compile_query(
        spark,
        "fork ( => from L => from R ) | anti join on k=k | sort k",
        tables={"L": left, "R": right},
    )
    assert [r.k for r in out.collect()] == [1, 3]


def test_cast_typed_null_and_primitive(ev):
    out = run(ev, 'yield {a: cast(v, <int64>), b: cast(null, typeof(kind))}')
    f = {x.name: x.dataType for x in out.schema.fields}
    assert f["a"] == T.LongType() and f["b"] == T.StringType()


def test_functions(ev):
    out = run(
        ev,
        'yield {u: to_upper(kind), n: len(kind), t: len(tags), '
        'first_tag: tags[0], joined: join(tags, "-")}',
    ).orderBy(F.col("n")).collect()
    buy = [r for r in out if r.u == "BUY"][0]
    click = [r for r in out if r.u == "CLICK"][0]
    assert click.n == 5 and click.t == 2
    assert click.first_tag == "a" and click.joined == "a-b"
    assert buy.t is None


def test_uniq_and_fuse_noop(ev):
    assert run(ev, "cut kind | uniq").count() == 3
    assert run(ev, "fuse").count() == 4


def test_compile_predicate_unbound(ev):
    col = compile_predicate('kind in ["click"] and v > 5')
    assert [r.id for r in ev.filter(col).collect()] == [3]


def test_looks_like_zed():
    assert looks_like_zed("| out:={a: 1}")
    assert not looks_like_zed("named_struct('a', 1)")


def test_rule_seq_requires_no_sources(ev):
    wrapped = ev.select(F.struct("*").alias("in"))
    out = compile_rule_seq(wrapped, "| out:={id: in.id}")
    assert "out" in out.columns
    with pytest.raises(ZedCompileError):
        compile_rule_seq(wrapped, "from ( pool \"X\" )")


def test_zed_transform_shaper(ev):
    """zed_transform = the -shaper hook (cli/shaper.go:12-14,
    fifo/lake.go:94-106): a parsed-once script applied per batch."""
    from zinger_spark.zedql import zed_transform

    t = zed_transform("v > 2.0 | score:=v * 10 | cut id, score")
    rows = {(r.id, r.score) for r in t(ev).collect()}
    assert rows == {(1, 30.0), (3, 90.0), (4, 25.0)}
    # reusable across batches with different stats
    assert t(ev.limit(1)).columns == ["id", "score"]


def test_zed_transform_shaper_in_sync_batches(spark, tmp_path):
    """to-kafka --shaper: the script runs between the pool scan and the
    produce (fifo/lake.go:84-92 applies it inside ReadBatch)."""
    from zinger_spark.datamodel import wrap_envelope
    from zinger_spark.sources.pool import Pool
    from zinger_spark.streaming.to_kafka import sync_batches
    from zinger_spark.zedql import zed_transform

    pool = Pool.create(spark, str(tmp_path / "P"))
    src = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "o long, s string")
    pool.load_batch(wrap_envelope(src, "T", src.o, src.s, src.s))
    got: list = []
    n = sync_batches(
        pool,
        "T",
        0,
        lambda df: got.extend(df.collect()),
        batch_size=4,
        transform=zed_transform("value != \"v2\""),
    )
    assert n == 5  # v2 dropped by the shaper
    assert {r.value for r in got} == {"v0", "v1", "v3", "v4", "v5"}


def test_unknown_function(ev):
    with pytest.raises(ZedCompileError):
        run(ev, "yield {a: frobnicate(id)}")


# --------------------------------------------------------------------------
# Robustness: the dialect is user-facing (YAML blocks, --shaper files,
# cli query -z), so malformed input must raise ZedSyntaxError — never
# hang, recurse forever, or escape an internal exception.

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_escapes_internal_errors(text):
        try:
            parse(text)
        except ZedSyntaxError:
            pass

    _TOKENS = st.sampled_from(
        "from fork switch case default pool yield sort head tail cut drop "
        "where put rename uniq fuse pass join anti on by count sum min max "
        'this in and or not ( ) { } [ ] | => := == != < > <= >= , . : '
        '"s" 42 3.5 true false null x kafka.topic <done> type done ='.split()
    )

    @given(st.lists(_TOKENS, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_parser_token_soup(tokens):
        try:
            parse(" ".join(tokens))
        except ZedSyntaxError:
            pass


# --------------------------------------------------------------------------
# End-to-end: the reference's full generated program
# (ztests/etl-zed.yaml golden — the exact text `zync etl -zed` prints
# for demo/invoices.yaml)

GENERATED_PROGRAM = """
type done = {kafka:{topic:string,offset:int64}}
fork (
  => from (
    pool "Raw" => kafka.topic=="Invoices"
    pool "Staging" => is(<done>) kafka.topic=="Invoices"
  ) | anti join on kafka.offset=kafka.offset

  => from (
    pool "Raw" => kafka.topic=="InvoiceStatus"
    pool "Staging" => is(<done>) kafka.topic=="InvoiceStatus"
  ) | anti join on kafka.offset=kafka.offset
)
| yield this
| switch (
  case value.op in ["c", "r"] =>
    fork (
      => kafka.topic=="Invoices" | yield {left:this} | sort left.value.after.ID
      => kafka.topic=="InvoiceStatus" | yield {right:this} | sort right.value.after.InvoiceID
    )
    | join on left.value.after.ID=right.value.after.InvoiceID right:=right
    | fork (
      =>
          // === user-defined ETL ===
          out:={
            key: left.key,
            value: {
              ID: left.value.after.ID,
              customer: left.value.after.customer,
              item: left.value.after.item,
              invoice_status: right.value.after.status
            }
          }
        | out.kafka:=left.kafka
        | yield out
        | kafka.topic:="NewInvoices"
      =>  yield {
             left:cast({kafka:{topic:left.kafka.topic,offset:left.kafka.offset}},done),
             right:cast({kafka:{topic:right.kafka.topic,offset:right.kafka.offset}},done)
          }
    )
  case (value.op=="u") and kafka.topic=="InvoiceStatus" =>
    fork (
      =>
        yield {in:this}
    // === user-defined ETL ===
        | out:={
            key: {
              ID: in.value.after.InvoiceID
            },
            value: {
              ID: in.value.after.InvoiceID,
              invoice_status: in.value.after.status
            }
          }
        | out.kafka:=in.kafka
        | yield out
        | kafka.topic:="NewInvoices"
      =>
        yield cast({kafka:{topic:kafka.topic,offset:kafka.offset}},done)
      )
)
| sort kafka.offset
"""

AFTER_INV = "struct<ID:bigint,customer:string,item:string>"
AFTER_IS = "struct<ID:bigint,InvoiceID:bigint,status:string>"


def _env(spark, rows, after):
    schema = (
        "kafka struct<topic:string,partition:bigint,offset:bigint>, "
        "key struct<ID:bigint>, "
        f"value struct<op:string,before:{after},after:{after}>, "
        "_type string"
    )
    return spark.createDataFrame(rows, schema)


def test_generated_program_batch1(spark):
    inv = _env(
        spark,
        [
            (("Invoices", 0, 1), (100,), ("r", None, (100, "Alice", "taco")), "data"),
            (("Invoices", 0, 2), (101,), ("r", None, (101, "Bob", "burrito")), "data"),
        ],
        AFTER_INV,
    )
    ist = _env(
        spark,
        [
            (("InvoiceStatus", 0, 1), (80,), ("r", None, (80, 101, "pending")), "data"),
            (("InvoiceStatus", 0, 2), (32,), ("r", None, (32, 100, "pending")), "data"),
        ],
        AFTER_IS,
    )
    raw = fuse(inv, ist)
    staging = spark.createDataFrame([], raw.schema)
    out = compile_query(
        spark, GENERATED_PROGRAM, tables={"Raw": raw, "Staging": staging}
    )
    flat = set()
    for r in out.collect():
        d = r.asDict(recursive=True)
        if d.get("left") or d.get("right"):
            flat.add(
                (
                    "pair",
                    d["left"]["kafka"]["topic"],
                    d["left"]["kafka"]["offset"],
                    d["right"]["kafka"]["topic"],
                    d["right"]["kafka"]["offset"],
                )
            )
        else:
            flat.add(
                (
                    d["kafka"]["topic"],
                    d["kafka"]["offset"],
                    d["key"]["ID"],
                    d["value"]["customer"],
                    d["value"]["invoice_status"],
                )
            )
    # matches ztests/etl-demo.yaml batch 1 pre-offset-assignment: the
    # two joined data records (carrying their input offsets until
    # pipeline.go insertOffsets renumbers) + one done pair per join
    assert flat == {
        ("NewInvoices", 1, 100, "Alice", "pending"),
        ("NewInvoices", 2, 101, "Bob", "pending"),
        ("pair", "Invoices", 1, "InvoiceStatus", 2),
        ("pair", "Invoices", 2, "InvoiceStatus", 1),
    }


# demo/update.zed VERBATIM (const map literals, txn bundling via
# collect/max/or aggregates, map subscripts over records[i] paths)
UPDATE_ZED = """
const customerIDs = |{
        "jane": 1,
        "bob": 2,
        "sarah": 3
}|
const menuIDs = |{
        "burrito": 100,
        "taco": 200,
        "chips": 300
}|
from (
  pool raw => seqno >= 2 | sort seqno
  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno
)
| anti join on seqno=seqno
| records:=collect(this),seqno:=max(seqno),done:=or(value.done) by txn:=value.txn
| done==true
| yield {
    customerID:customerIDs[records[0].value.row.customer],
    menuID:menuIDs[records[0].value.row.product],
    qty: records[0].value.row.qty,
    total: records[0].value.row.qty * records[1].value.row.price
  }
"""


def test_update_zed_verbatim(spark):
    """The design.md cursor/txn-bundle demo program (demo/update.zed),
    compiled and run against the consume-1/consume-2 demo data with an
    empty staging pool: the seqno >= 2 window hides txn 10000's order
    row, so its bundle resolves with a null customer, while txn 10001
    completes as bob/burrito 1 x 5.99."""
    schema = (
        "seqno bigint, kafka struct<topic:string,offset:bigint>, "
        "value struct<txn:bigint,done:boolean,"
        "row:struct<customer:string,product:string,qty:bigint,price:double>>, "
        "_type string"
    )
    rows = [
        (1, ("order", 1), (10000, False, ("jane", "taco", 2, None)), "data"),
        (2, ("order", 2), (10001, False, ("bob", "burrito", 1, None)), "data"),
        (3, ("menu", 1), (10000, True, (None, "taco", None, 1.99)), "data"),
        (4, ("menu", 2), (10001, True, (None, "burrito", None, 5.99)), "data"),
    ]
    raw = spark.createDataFrame(rows, schema)
    staging = spark.createDataFrame([], raw.schema)
    out = compile_query(
        spark, UPDATE_ZED, tables={"raw": raw, "staging": staging}
    ).collect()
    # seqno >= 2 hides txn 10000's order row, so its bundle is
    # incomplete for the cut (records[0] is the menu row with null
    # customer); txn 10001 resolves bob/burrito, 1 * 5.99
    got = {(r.customerID, r.menuID, r.qty, r.total) for r in out}
    assert (2, 100, 1, 5.99) in got
    assert len(got) == 2  # 10000's bundle yields a null-customer row


def test_update_zed_staged_seqnos_anti_joined(spark):
    """With staging carrying seqno 2 and 3 (already processed), only
    seqno 4 survives the anti join — txn 10001 stays incomplete and
    nothing passes done==true."""
    schema = (
        "seqno bigint, kafka struct<topic:string,offset:bigint>, "
        "value struct<txn:bigint,done:boolean,"
        "row:struct<customer:string,product:string,qty:bigint,price:double>>, "
        "_type string"
    )
    rows = [
        (2, ("order", 2), (10001, False, ("bob", "burrito", 1, None)), "data"),
        (3, ("menu", 1), (10000, True, (None, "taco", None, 1.99)), "data"),
        (4, ("menu", 2), (10001, True, (None, "burrito", None, 5.99)), "data"),
    ]
    raw = spark.createDataFrame(rows, schema)
    staged = spark.createDataFrame(
        [(2, None, None, "data"), (3, None, None, "data")], schema
    )
    out = compile_query(
        spark, UPDATE_ZED, tables={"raw": raw, "staging": staged}
    ).collect()
    # only seqno 4 (txn 10001 menu row, done=true but records[1] absent)
    assert len(out) == 1
    assert out[0].total is None


def test_remaining_demo_zed_files_parse():
    """Every shipped demo .zed program parses: pending.zed (the
    anti-join prelude alone), etl.zed (const maps + legacy cut-yield),
    update-etl.zed (windowed scan + anti join)."""
    pending = (
        'fork (\n'
        '  => from (\n'
        '    pool "Raw" => kafka.topic=="Invoices"\n'
        '    pool "Staging" => is(<done>) kafka.topic=="Invoices"\n'
        '  ) | anti join on kafka.offset=kafka.offset\n'
        '  => from (\n'
        '    pool "Raw" => kafka.topic=="InvoiceStatus"\n'
        '    pool "Staging" => is(<done>) kafka.topic=="InvoiceStatus"\n'
        '  ) | anti join on kafka.offset=kafka.offset\n'
        ')\n'
    )
    etl = (
        'const customerIDs = |{"jane": 1, "bob": 2, "sarah": 3}|;\n'
        'const menuIDs = |{"burrito": 100, "taco": 200, "chips": 300}|;\n'
        'from raw\n'
        '| records:=collect(this),seqno:=max(seqno),done:=or(value.done) by txn:=value.txn\n'
        '| done==true\n'
        '| cut yield{\n'
        '    customerID:customerIDs[records[0].value.row.customer],\n'
        '    menuID:menuIDs[records[0].value.row.product],\n'
        '    qty: records[0].value.row.qty,\n'
        '    total: records[0].value.row.qty * records[1].value.row.price\n'
        '  }\n'
    )
    update_etl = (
        'from (\n'
        '  pool raw => seqno >= 2 | sort seqno\n'
        '  pool staging => not is(<cursor>) | seqno >= 2 | cut seqno | sort seqno\n'
        ')\n'
        '| anti join on seqno=seqno\n'
    )
    for name, text in [("pending", pending), ("etl", etl), ("update-etl", update_etl)]:
        p = parse(text)
        assert p.seq.ops, name


def test_generated_program_dones_filter_second_run(spark):
    """Run 2: with done markers in Staging, the anti-join drops the
    already-processed inputs (the incremental contract,
    README.md:140-156)."""
    inv = _env(
        spark,
        [
            (("Invoices", 0, 1), (100,), ("u", None, (100, "Alice", "taco")), "data"),
            (("Invoices", 0, 2), (101,), ("u", None, (101, "Bob", "burrito")), "data"),
        ],
        AFTER_INV,
    )
    staging = _env(
        spark,
        [(("Invoices", None, 1), None, None, "done")],
        AFTER_INV,
    )
    prog = (
        "type done = {kafka:{topic:string,offset:int64}}\n"
        'from (\n'
        '  pool "Raw" => kafka.topic=="Invoices"\n'
        '  pool "Staging" => is(<done>) kafka.topic=="Invoices"\n'
        ") | anti join on kafka.offset=kafka.offset\n"
        "| cut kafka.offset\n"
    )
    out = compile_query(spark, prog, tables={"Raw": inv, "Staging": staging})
    assert [r.kafka.offset for r in out.collect()] == [2]


# --------------------------------------------------------------------------
# over (array un-nesting)


def test_over_record_elements(spark):
    df = spark.createDataFrame(
        [(1, [(10, "a"), (20, "b")]), (2, [(30, "c")])],
        "id long, items array<struct<qty:long,sku:string>>",
    )
    out = compile_query(spark, "from t | over items | sort sku", tables={"t": df})
    assert [tuple(r) for r in out.collect()] == [(10, "a"), (20, "b"), (30, "c")]


def test_over_scalar_elements_named_by_path(spark):
    df = spark.createDataFrame([(1, ["x", "y"]), (2, ["y"])], "id long, tags array<string>")
    out = compile_query(
        spark, "from t | over tags | n:=count() by tags | sort -r n", tables={"t": df}
    )
    assert [tuple(r) for r in out.collect()] == [("y", 2), ("x", 1)]


def test_over_computed_expr_named_value(spark):
    df = spark.createDataFrame([(1, "a b a")], "id long, text string")
    out = compile_query(
        spark,
        'from t | over split(text, " ") | n:=count() by value | sort -r n, value',
        tables={"t": df},
    )
    assert [tuple(r) for r in out.collect()] == [("a", 2), ("b", 1)]


def test_over_multiple_exprs_concatenate(spark):
    df = spark.createDataFrame([(1, [1, 2], [3])], "id long, a array<long>, b array<long>")
    out = compile_query(spark, "from t | over a, b | sort a", tables={"t": df})
    # both legs carry scalar columns named by their paths, fused
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, None), (2, None), (None, 3)}


def test_over_non_array_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ZedCompileError, match="array"):
        compile_query(spark, "from t | over id", tables={"t": df})


def test_top_operator(spark):
    df = spark.createDataFrame(
        [(i, i * 10 % 70) for i in range(10)], "id long, v long"
    )
    out = compile_query(spark, "from t | top 3 v, id", tables={"t": df})
    rows = [tuple(r) for r in out.collect()]
    # v desc then id desc
    expected = sorted([(i, i * 10 % 70) for i in range(10)],
                      key=lambda t: (-t[1], -t[0]))[:3]
    assert rows == expected


def test_top_requires_integer(spark):
    with pytest.raises(ZedSyntaxError):
        parse("from t | top x v")


def test_every_duration_bucketing(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 10, 5), "a"),
         (dt.datetime(2024, 1, 1, 10, 55), "a"),
         (dt.datetime(2024, 1, 1, 11, 5), "b")],
        "ts timestamp, k string",
    )
    out = compile_query(
        spark, "from t | n:=count() by every(1h) | sort ts", tables={"t": df}
    )
    rows = [(str(r["ts"]), r["n"]) for r in out.collect()]
    assert rows == [("2024-01-01 10:00:00", 2), ("2024-01-01 11:00:00", 1)]
    # 30m buckets split the first hour
    out = compile_query(
        spark, "from t | n:=count() by every(30m) | sort ts", tables={"t": df}
    )
    assert [r["n"] for r in out.collect()] == [1, 1, 1]


def test_every_rejects_subsecond(spark):
    df = spark.createDataFrame([(1,)], "ts long")
    with pytest.raises(ZedCompileError, match="whole-second"):
        compile_query(spark, "from t | n:=count() by every(500ms)", tables={"t": df})


def test_duration_arithmetic_on_timestamps(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 10, 20)),
         (2, dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 1, 12, 0))],
        "id long, a timestamp, b timestamp",
    )
    out = compile_query(
        spark, "from t | where b < a + 30m | cut id", tables={"t": df}
    )
    assert [r["id"] for r in out.collect()] == [1]
    out2 = compile_query(
        spark, "from t | shifted:=a + 1h | cut id, shifted | sort id",
        tables={"t": df},
    )
    assert str(out2.collect()[0]["shifted"]) == "2024-01-01 11:00:00"


def test_time_literals_in_predicates(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 9, 45)), (2, dt.datetime(2024, 1, 1, 11, 0))],
        "id long, ts timestamp",
    )
    out = compile_query(
        spark,
        "from t | where ts > 2024-01-01T10:30:00Z - 1h | cut id",
        tables={"t": df},
    )
    assert [r["id"] for r in out.collect()] == [1, 2]
    out2 = compile_query(
        spark, "from t | where ts >= 2024-01-01T10:30:00Z | cut id", tables={"t": df}
    )
    assert [r["id"] for r in out2.collect()] == [2]
    with pytest.raises(ZedCompileError, match="offsets"):
        compile_query(
            spark, "from t | where ts > 2024-01-01T10:30:00+05:00", tables={"t": df}
        )


def test_uniq_count(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    out = compile_query(spark, "from t | cut k | uniq -c | sort k", tables={"t": df})
    assert [(r["k"], r["count"]) for r in out.collect()] == [("a", 2), ("b", 1)]
    with pytest.raises(ZedSyntaxError, match="uniq flag"):
        parse("uniq -z")


# --------------------------------------------------------------------------
# r7 dialect depth: regex search terms, nested rename/drop, left join


def test_regex_literal_searches_all_string_fields(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", "web"), (2, "gamma", "lab-x"), (3, None, "plain")],
        "id long, text string, src string",
    )
    out = compile_query(
        spark, "from t | /(beta|lab)/ | cut id", tables={"t": df}
    )
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_regex_literal_vs_division(spark):
    df = spark.createDataFrame([(10,)], "n long")
    out = compile_query(
        spark, "from t | half:=n / 2 | cut half", tables={"t": df}
    )
    assert out.collect()[0].half == 5.0


def test_regex_in_grep_call_with_target(spark):
    df = spark.createDataFrame(
        [(1, "spark"), (2, "sparrow"), (3, "flint")], "id long, s string"
    )
    out = compile_query(
        spark, "from t | grep(/^spar/, s) | cut id", tables={"t": df}
    )
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_regex_searches_string_arrays(spark):
    df = spark.createDataFrame(
        [(1, ["aa", "needle-x"]), (2, ["bb"]), (3, None)],
        "id long, toks array<string>",
    )
    out = compile_query(spark, "from t | /needle/ | cut id", tables={"t": df})
    assert [r.id for r in out.collect()] == [1]


def test_unterminated_regex_errors():
    with pytest.raises(ZedSyntaxError, match="unterminated regex"):
        parse("from t | /oops")


def test_rename_nested_in_place_preserves_order(spark):
    df = spark.createDataFrame(
        [((1, 2.5, "k"),)], "w struct<a:long,b:double,c:string>"
    )
    out = compile_query(
        spark, "from t | rename w.bb := w.b", tables={"t": df}
    )
    assert out.schema["w"].dataType.simpleString() == (
        "struct<a:bigint,bb:double,c:string>"
    )
    assert out.collect()[0].w.bb == 2.5


def test_rename_nested_missing_is_noop(spark):
    df = spark.createDataFrame([((1,),)], "w struct<a:long>")
    out = compile_query(
        spark, "from t | rename w.zz := w.nope", tables={"t": df}
    )
    assert out.schema["w"].dataType.simpleString() == "struct<a:bigint>"


def test_rename_across_records_errors(spark):
    df = spark.createDataFrame([((1,), 2)], "w struct<a:long>, x long")
    with pytest.raises(ZedCompileError, match="same record"):
        compile_query(spark, "from t | rename x := w.a", tables={"t": df})


def test_rename_then_drop_nested(spark):
    df = spark.createDataFrame(
        [((1, 2),)], "w struct<keep:long,gone:long>"
    )
    out = compile_query(
        spark,
        "from t | rename w.kept := w.keep | drop w.gone",
        tables={"t": df},
    )
    assert out.schema["w"].dataType.simpleString() == "struct<kept:bigint>"


def test_left_join_keeps_unmatched_with_nulls(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(1, "r1"), (3, "r3")], "k long, rv string")
    out = compile_query(
        spark,
        "fork ( => from l => from r ) | left join on k=k val:=rv",
        tables={"l": left, "r": right},
    )
    assert sorted((r.k, r.val) for r in out.collect()) == [
        (1, "r1"), (2, None), (3, "r3"),
    ]


def test_string_plus_concatenates(spark):
    df = spark.createDataFrame([("a", 1)], "s string, n bigint")
    out = zed_transform('t := s + "-" + string(n) | cut t')(df).collect()
    assert out[0]["t"] == "a-1"
    # numeric + stays arithmetic
    out = zed_transform("m := n + 2 | cut m")(df).collect()
    assert out[0]["m"] == 3


def test_network_functions(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(ip="10.1.2.3"),
            Row(ip="10.64.0.1"),
            Row(ip="192.168.1.77"),
            Row(ip="not-an-ip"),
            Row(ip="10.1.2.300"),  # octet out of range
        ]
    )
    out = {
        r["ip"]: (r["m8"], r["m10"], r["net"])
        for r in zed_transform(
            'm8 := cidr_match("10.0.0.0/8", ip) '
            '| m10 := cidr_match("10.64.0.0/10", ip) '
            '| net := network_of(ip, 24) | cut ip, m8, m10, net'
        )(df).collect()
    }
    assert out["10.1.2.3"] == (True, False, "10.1.2.0/24")
    assert out["10.64.0.1"] == (True, True, "10.64.0.0/24")
    assert out["192.168.1.77"] == (False, False, "192.168.1.0/24")
    # malformed input: never a match, never an error
    assert out["not-an-ip"] == (False, False, None)
    assert out["10.1.2.300"] == (False, False, None)


def test_network_function_edges(spark):
    from pyspark.sql import Row

    from zinger_spark.functions import net as znet
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(ip="203.0.113.9")])
    row = df.select(
        znet.cidr_match("0.0.0.0/0", F.col("ip")).alias("all"),
        znet.cidr_match("203.0.113.9/32", F.col("ip")).alias("exact"),
        znet.cidr_match("203.0.113.8/32", F.col("ip")).alias("off1"),
        znet.cidr_match("203.0.113.0/33", F.col("ip")).alias("badpfx"),
        znet.network_of(F.col("ip"), 0).alias("net0"),
        znet.network_of(F.col("ip"), 32).alias("net32"),
    ).collect()[0]
    assert row["all"] is True and row["exact"] is True
    assert row["off1"] is False and row["badpfx"] is False
    assert row["net0"] == "0.0.0.0/0" and row["net32"] == "203.0.113.9/32"


def test_shaping_functions(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "b bigint, a string, extra double")
    prog = (
        "type t = {a: string, b: float64, c: int64}\n"
        "rec := {b: b, a: a, extra: extra}\n"
        "| s := shape(rec, <t>) | f := fill(rec, <t>)"
        " | c := crop(rec, <t>) | o := order(rec, <t>) | cut s, f, c, o"
    )
    out = zed_transform(prog)(df)
    row = out.collect()[0]
    d = dict(out.dtypes)
    # shape: fill + order + cast, extras after typed fields
    assert d["s"] == "struct<a:string,b:double,c:bigint,extra:double>"
    assert row["s"].asDict() == {"a": "x", "b": 1.0, "c": None, "extra": 2.5}
    # fill: appends missing, keeps source order and types
    assert d["f"] == "struct<b:bigint,a:string,extra:double,c:bigint>"
    # crop: drops extras, types unchanged
    assert d["c"] == "struct<b:bigint,a:string>"
    assert row["c"].asDict() == {"b": 1, "a": "x"}
    # order: reorders only
    assert d["o"] == "struct<a:string,b:bigint,extra:double>"
    assert row["o"].asDict() == {"a": "x", "b": 1, "extra": 2.5}


def test_shaping_functions_nested_and_null(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(rec=Row(inner=Row(y=2, x=1), z=9)),
            Row(rec=None),
        ],
        "rec struct<inner:struct<y:bigint,x:bigint>,z:bigint>",
    )
    prog = (
        "type t = {inner: {x: int64, y: float64}, w: string}\n"
        "s := shape(rec, <t>) | cut s"
    )
    out = zed_transform(prog)(df)
    assert dict(out.dtypes)["s"] == (
        "struct<inner:struct<x:bigint,y:double>,w:string,z:bigint>"
    )
    rows = out.collect()
    assert rows[0]["s"].asDict(True) == {
        "inner": {"x": 1, "y": 2.0}, "w": None, "z": 9
    }
    assert rows[1]["s"] is None  # null stays null, not a struct of nulls


def test_shaping_unknown_type_errors(spark):
    df = spark.createDataFrame([(1,)], "a bigint")
    with pytest.raises(ZedCompileError, match="unknown type"):
        zed_transform("s := shape(a, <nope>) | cut s")(df)


def test_parse_uri(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(u="https://alice@api.example.com:8443/v1/items?x=1&y=2#frag"),
            Row(u="http://example.com/plain"),
            Row(u="mailto:someone@example.com"),
            Row(u="/relative/path?q=3"),
        ]
    )
    rows = {r["u"]: r["p"].asDict() for r in zed_transform("p := parse_uri(u) | cut u, p")(df).collect()}
    full = rows["https://alice@api.example.com:8443/v1/items?x=1&y=2#frag"]
    assert full == {
        "scheme": "https", "userinfo": "alice", "host": "api.example.com",
        "port": 8443, "path": "/v1/items", "query": "x=1&y=2", "fragment": "frag",
    }
    plain = rows["http://example.com/plain"]
    assert plain["host"] == "example.com" and plain["port"] is None
    assert plain["query"] is None and plain["fragment"] is None
    mailto = rows["mailto:someone@example.com"]
    assert mailto["scheme"] == "mailto" and mailto["host"] is None
    assert mailto["path"] == "someone@example.com"
    rel = rows["/relative/path?q=3"]
    assert rel["scheme"] is None and rel["path"] == "/relative/path"
    assert rel["query"] == "q=3"


def test_shape_operator_form(spark):
    """`| shape <t>` is Zed's operator spelling: shape(this, <t>) with
    the shaped record flattened back to top-level columns."""
    df = spark.createDataFrame([(1, "x", 2.5)], "b bigint, a string, extra double")
    prog = "type t = {a: string, b: float64, c: int64}\nshape <t>"
    out = zed_transform(prog)(df)
    assert [f for f, _ in out.dtypes] == ["a", "b", "c", "extra"]
    assert out.collect()[0].asDict() == {"a": "x", "b": 1.0, "c": None, "extra": 2.5}
    # crop form drops the extra
    out2 = zed_transform("type t = {a: string, b: int64}\ncrop <t>")(df)
    assert [f for f, _ in out2.dtypes] == ["b", "a"]
    # a bare field NAMED shape still parses as an expression
    df2 = spark.createDataFrame([(3,)], "shape bigint")
    assert zed_transform("where shape >= 3")(df2).count() == 1


def test_compile_predicate_unbound_arithmetic(ev):
    """Unbound `+` (df=None, the YAML where-clause path) must compile
    numerically — the string-concat type probe needs a schema and must
    not dereference a None df."""
    col = compile_predicate("v + 1 > 6")
    assert [r.id for r in ev.filter(col).collect()] == [3]


def test_compile_predicate_unbound_string_concat():
    """Literal string `+` still concatenates without a schema."""
    col = compile_predicate('"a" + "b" == "ab"')
    assert col is not None


def test_compile_predicate_unbound_grep(ev):
    """Unbound grep on a scalar path falls back to rlike instead of
    walking a schema it doesn't have."""
    col = compile_predicate('grep("cli.*", kind)')
    got = sorted(r.id for r in ev.filter(col).collect())
    assert got == sorted(r.id for r in ev.filter("kind rlike 'cli.*'").collect())


# --------------------------------------------------------------------------
# Round-7 function-library depth: regexp/levenshtein/base64/hex/strftime/
# bucket/kind/flatten/unflatten/grok (Zed func docs; shapers hit these
# first when parsing raw log topics)


def test_levenshtein_and_regexp_funcs(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting", "a1b22c333")], "a string, b string, s string"
    )
    out = zed_transform(
        "d := levenshtein(a, b) "
        r"| m := regexp(/(\d+)b(\d+)/, s) "
        '| r := regexp_replace(s, /[0-9]+/, "#") '
        "| cut d, m, r"
    )(df).collect()[0]
    assert out["d"] == 3
    assert out["m"] == ["1b22", "1", "22"]
    assert out["r"] == "a#b#c#"


def test_regexp_no_match_is_null(spark):
    df = spark.createDataFrame([("xyz",)], "s string")
    out = zed_transform(r"m := regexp(/\d+/, s) | cut m")(df).collect()[0]
    assert out["m"] is None


def test_base64_and_hex_type_directed(spark):
    df = spark.createDataFrame([("aGk=",)], "s string")
    out = zed_transform(
        "b := base64(s) "  # string -> decoded bytes
        "| h := hex(b) "  # bytes -> hex string
        "| rt := base64(b) "  # bytes -> encoded string (round trip)
        "| raw := hex(h) "  # hex string -> bytes
        "| cut b, h, rt, raw"
    )(df).collect()[0]
    assert bytes(out["b"]) == b"hi"
    assert out["h"] == "6869"
    assert out["rt"] == "aGk="
    assert bytes(out["raw"]) == b"hi"


def test_strftime_and_bucket(spark):
    df = spark.createDataFrame(
        [("2024-03-05 14:09:59",)], "raw string"
    ).select(F.to_timestamp("raw").alias("t"))
    out = zed_transform(
        's := strftime("%Y-%m-%dT%H:%M:%S", t) '
        '| pct := strftime("100%%", t) '
        "| b := bucket(t, 5m) | cut s, pct, b"
    )(df).collect()[0]
    assert out["s"] == "2024-03-05T14:09:59"
    assert out["pct"] == "100%"
    assert str(out["b"]) == "2024-03-05 14:05:00"


def test_strftime_rejects_unknown_directive(spark):
    df = spark.createDataFrame([("x",)], "s string")
    with pytest.raises(ZedCompileError, match="strftime"):
        zed_transform('y := strftime("%Q", now()) | cut y')(df)


def test_kind_flatten_unflatten(spark):
    df = spark.createDataFrame(
        [((1, ("a", 2.5)), ["t"], 7)],
        "rec struct<id:long,sub:struct<name:string,score:double>>, "
        "tags array<string>, n long",
    )
    out = zed_transform(
        "k1 := kind(rec) | k2 := kind(tags) | k3 := kind(n) "
        "| fl := flatten(rec) | rt := unflatten(flatten(rec)) "
        "| cut k1, k2, k3, fl, rt"
    )(df).collect()[0]
    assert (out["k1"], out["k2"], out["k3"]) == ("record", "array", "primitive")
    # depth-first leaves, mixed long/string/double values widen to string
    assert [(list(e["key"]), e["value"]) for e in out["fl"]] == [
        (["id"], "1"),
        (["sub", "name"], "a"),
        (["sub", "score"], "2.5"),
    ]
    assert out["rt"]["id"] == 1 and out["rt"]["sub"]["score"] == 2.5


def test_flatten_uniform_types_stay_typed(spark):
    df = spark.createDataFrame([((1, 2),)], "r struct<a:long,b:long>")
    out = zed_transform("fl := flatten(r) | cut fl")(df)
    assert out.schema["fl"].dataType.elementType["value"].dataType == T.LongType()
    assert [e["value"] for e in out.collect()[0]["fl"]] == [1, 2]


def test_unflatten_dynamic_keys_gate(spark):
    df = spark.createDataFrame([([("k", "v")],)], "a array<struct<key:string,value:string>>")
    with pytest.raises(ZedCompileError, match="unflatten"):
        zed_transform("u := unflatten(a) | cut u")(df)


def test_unflatten_filtered_leaves_static_keys(spark):
    """The idiomatic dynamic-leaf rewrite: flatten a record, filter its
    leaves in a lateral scope, unflatten the survivors.  The key set is
    static (it comes from the program's flatten()), so the output
    record keeps the flattened shape with dropped leaves as null."""
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "secret", 7.0)], "a long, b string, c double"
    )
    out = zed_transform(
        "over flatten({a: a, b: b, c: c}) with id = a "
        '=> ( where value != "secret" '
        "| lv := collect({key: key, value: value}) by id ) "
        "| u := unflatten(lv) | cut id, u"
    )(df)
    got = {r["id"]: r["u"].asDict() for r in out.collect()}
    # row 1 keeps every leaf (types restored from the widened strings);
    # row 2's b was filtered out -> null, other leaves survive
    assert got[1] == {"a": 1, "b": "x", "c": 2.5}
    assert got[2] == {"a": 2, "b": None, "c": 7.0}
    # rebuilt types are the flattened record's, not the widened ones
    u_t = out.schema["u"].dataType
    assert u_t["a"].dataType == T.LongType()
    assert u_t["c"].dataType == T.DoubleType()


def test_unflatten_nested_rebuild(spark):
    """Nested records rebuild through the same static key walk."""
    df = spark.createDataFrame(
        [((1, ("n", 9)),)],
        "r struct<id:long,sub:struct<name:string,score:long>>",
    )
    out = zed_transform(
        "over flatten(r) with k = r.id "
        "=> ( where value != \"n\" | lv := collect({key: key, value: value}) by k ) "
        "| u := unflatten(lv) | cut u"
    )(df).collect()[0]
    assert out["u"]["id"] == 1
    assert out["u"]["sub"]["name"] is None and out["u"]["sub"]["score"] == 9


def test_grok_extracts_named_fields(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-02T03:04:05Z ERROR disk full on /dev/sda1",),
            ("not a log line at all",),
        ],
        "line string",
    )
    rows = zed_transform(
        'g := grok("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} '
        '%{GREEDYDATA:msg}", line) | cut line, g'
    )(df).collect()
    byline = {r["line"]: r["g"] for r in rows}
    g = byline["2024-01-02T03:04:05Z ERROR disk full on /dev/sda1"]
    assert g["ts"] == "2024-01-02T03:04:05Z"
    assert g["level"] == "ERROR"
    assert g["msg"] == "disk full on /dev/sda1"
    assert byline["not a log line at all"] is None


def test_grok_unknown_pattern_errors(spark):
    df = spark.createDataFrame([("x",)], "line string")
    with pytest.raises(ZedCompileError, match="NOPE"):
        zed_transform('g := grok("%{NOPE:x}", line) | cut g')(df)


def test_grok_apache_common_log(spark):
    df = spark.createDataFrame(
        [
            (
                '203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] '
                '"GET /index.html HTTP/1.0" 200 2326',
            )
        ],
        "line string",
    )
    out = zed_transform(
        'g := grok("%{IPORHOST:client} %{NOTSPACE:ident} %{NOTSPACE:auth} '
        r"\\[%{HTTPDATE:ts}\\] "  # Zed string escapes: \\ -> one backslash
        '%{QUOTEDSTRING:request} %{NONNEGINT:status} %{NONNEGINT:bytes}", line) '
        "| cut g"
    )(df).collect()[0]["g"]
    assert out["client"] == "203.0.113.9"
    assert out["auth"] == "frank"
    assert out["ts"] == "10/Oct/2000:13:55:36 -0700"
    assert out["status"] == "200" and out["bytes"] == "2326"


def test_sample_one_value_per_shape(spark):
    df = spark.createDataFrame(
        [(2, "b", "data"), (1, "a", "data"), (3, "c", "done")],
        "id long, s string, _type string",
    )
    out = zed_transform("sample")(df)
    rows = {(r["_type"], r["id"], r["s"]) for r in out.collect()}
    # deterministic representative = struct-min of the data columns
    assert rows == {("data", 1, "a"), ("done", 3, "c")}
    # `shapes` is the renamed alias
    out2 = zed_transform("shapes")(df)
    assert {(r["_type"], r["id"]) for r in out2.collect()} == {("data", 1), ("done", 3)}


def test_sample_single_shape_no_tag(spark):
    df = spark.createDataFrame([(5, "x"), (2, "y")], "id long, s string")
    rows = zed_transform("sample")(df).collect()
    assert len(rows) == 1 and rows[0]["id"] == 2 and rows[0]["s"] == "y"
    assert "_type" not in rows[0].asDict()


def test_merge_orders_and_combine_passes(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "id long")
    out = zed_transform("combine | merge id")(df).collect()
    assert [r["id"] for r in out] == [1, 2, 3]
    out = zed_transform("merge id desc | head 1")(df).collect()
    assert out[0]["id"] == 3


# --------------------------------------------------------------------------
# over ... with ... => ( ... ) — the lateral scope


def test_over_scope_counts_per_parent(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "c"), (3, "")], "id long, text string"
    )
    out = zed_transform(
        'over split(text, " ") with d = id '
        '=> ( where value != "" | n := count() by value )'
    )(df)
    rows = {tuple(r) for r in out.select("value", "n").collect()}
    # per-PARENT counts: parent 1's two "a"s stay its own group; parent
    # 3 contributes nothing (empty nested sequence)
    assert rows == {("a", 2), ("b", 1), ("c", 1)}
    # the binding d was never surfaced -> it is a variable, not a field
    assert set(out.columns) == {"value", "n"}


def test_over_scope_binding_as_group_key(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "c d"), (3, "")], "id long, text string"
    )
    out = zed_transform(
        'over split(text, " ") with d = id => ( n := count() by d )'
    )(df)
    # split("", " ") == [""]: parent 3's nested sequence is one empty
    # token (same both engines), hence n=1 — filter with `where` to drop
    assert {(r["d"], r["n"]) for r in out.collect()} == {(1, 3), (2, 2), (3, 1)}


def test_over_scope_yield_with_binding(spark):
    df = spark.createDataFrame([(7, "x y")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id '
        "=> ( yield {d: d, w: to_upper(value)} )"
    )(df)
    assert {(r["d"], r["w"]) for r in out.collect()} == {(7, "X"), (7, "Y")}
    assert out.columns == ["d", "w"]


def test_over_scope_put_unhides_binding(spark):
    df = spark.createDataFrame([(7, "x")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id => ( d := d * 10 )'
    )(df)
    rows = out.collect()
    assert rows[0]["d"] == 70 and rows[0]["value"] == "x"


def test_over_scope_where_only_hides_bindings(spark):
    df = spark.createDataFrame([(7, "x y")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id => ( where d == 7 )'
    )(df)
    assert out.columns == ["value"] and out.count() == 2


def test_over_scope_inner_sort_orders_collect(spark):
    """Inner `sort` in a lateral scope pins the per-parent element
    order; a downstream collect() preserves it — sort key independent
    of the collected value (r10 gate, now implemented: pid-partitioned
    row_number + ordered array collect)."""
    df = spark.createDataFrame(
        [
            (1, [("b", 5), ("a", 9), ("c", 1)]),
            (2, [("x", 2), ("y", 8)]),
        ],
        "id long, items array<struct<item:string,price:long>>",
    )
    out = zed_transform(
        "over items with d = id => ( sort -r price | names := collect(item) by d )"
    )(df)
    got = {r["d"]: list(r["names"]) for r in out.collect()}
    assert got == {1: ["a", "b", "c"], 2: ["y", "x"]}
    # internal order column never leaks
    assert set(out.columns) == {"d", "names"}


def test_over_scope_inner_sort_ascending_expression_key(spark):
    df = spark.createDataFrame([(1, "bb a ccc")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id '
        "=> ( sort len(value) | toks := collect(value) by d )"
    )(df)
    assert list(out.collect()[0]["toks"]) == ["a", "bb", "ccc"]


def test_over_scope_unsupported_op_still_errors(spark):
    df = spark.createDataFrame([(7, "x")], "id long, text string")
    with pytest.raises(ZedCompileError, match="over-scope"):
        zed_transform(
            'over split(text, " ") with d = id => ( sample )'
        )(df)


def test_over_scope_head_and_tail_in_array_order(spark):
    """head/tail inside a lateral scope cut on the element's ARRAY
    position (posexplode order — Zed's nested sequence is ordered), and
    head counts SURVIVORS after an in-scope where."""
    df = spark.createDataFrame(
        [(1, "a  b c d"), (2, "x y")], "id long, text string"
    )
    out = zed_transform(
        'over split(text, " ") with d = id '
        '=> ( where value != "" | head 2 | toks := collect(value) by d )'
    )(df)
    got = {r["d"]: list(r["toks"]) for r in out.collect()}
    # parent 1 has an empty token between a and b: head 2 takes the
    # first two NON-EMPTY tokens, in array order
    assert got == {1: ["a", "b"], 2: ["x", "y"]}

    out = zed_transform(
        'over split(text, " ") with d = id '
        '=> ( where value != "" | tail 2 | toks := collect(value) by d )'
    )(df)
    got = {r["d"]: list(r["toks"]) for r in out.collect()}
    assert got == {1: ["c", "d"], 2: ["x", "y"]}


def test_over_scope_sort_then_head_topk_per_parent(spark):
    """sort | head N inside the scope = per-parent top-N, the lateral
    form of the top operator."""
    df = spark.createDataFrame(
        [(1, [("b", 5), ("a", 9), ("c", 1)]), (2, [("x", 2), ("y", 8)])],
        "id long, items array<struct<item:string,price:long>>",
    )
    out = zed_transform(
        "over items with d = id "
        "=> ( sort -r price | head 2 | names := collect(item) by d )"
    )(df)
    got = {r["d"]: list(r["names"]) for r in out.collect()}
    assert got == {1: ["a", "b"], 2: ["y", "x"]}


def test_over_scope_yield_this_hides_plumbing(spark):
    """`yield this` as the scope's terminal op emits the element record
    only — no __over_pid/__over_ord, no unsurfaced bindings."""
    df = spark.createDataFrame([(7, "x y")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id => ( head 1 | yield this )'
    )(df)
    assert out.columns == ["value"]
    assert [r["value"] for r in out.collect()] == ["x"]


def test_over_scope_collect_preserves_array_order(spark):
    """collect() with no in-scope sort preserves the ARRAY order, not
    the natural value order (Zed's collect is order-preserving)."""
    df = spark.createDataFrame([(1, "c a b")], "id long, text string")
    out = zed_transform(
        'over split(text, " ") with d = id => ( toks := collect(value) by d )'
    )(df)
    assert list(out.collect()[0]["toks"]) == ["c", "a", "b"]


def test_over_with_without_scope_is_error():
    with pytest.raises(ZedSyntaxError, match="with"):
        parse("over a with d = id")


def test_nest_dotted(spark):
    df = spark.createDataFrame(
        [(1, 2, "z")],
        T.StructType(
            [
                T.StructField("a.b", T.LongType()),
                T.StructField("a.c", T.LongType()),
                T.StructField("x", T.StringType()),
            ]
        ),
    )
    out = zed_transform("yield nest_dotted(this)")(df)
    r = out.collect()[0]
    assert r["a"]["b"] == 1 and r["a"]["c"] == 2 and r["x"] == "z"
    assert out.schema.simpleString() == (
        "struct<a:struct<b:bigint,c:bigint>,x:string>"
    )


def test_nest_dotted_collision_errors(spark):
    df = spark.createDataFrame(
        [(1, 2)],
        T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("a.b", T.LongType())]
        ),
    )
    with pytest.raises(ZedCompileError, match="nest_dotted"):
        zed_transform("yield nest_dotted(this)")(df)


def test_strftime_translation_matches_python(spark):
    """Cross-validate the C->Java directive translation: Spark
    date_format through _strftime_java must agree with Python's own
    strftime for every supported directive over a spread of
    timestamps (month/day-name directives locale-pinned to English in
    both engines)."""
    import datetime as _dt

    stamps = [
        _dt.datetime(2024, 1, 1, 0, 0, 0),
        _dt.datetime(2024, 2, 29, 23, 59, 59),
        _dt.datetime(2025, 7, 4, 12, 30, 5),
        _dt.datetime(1999, 12, 31, 1, 2, 3),
        _dt.datetime(2030, 10, 15, 15, 45, 0),
    ]
    fmt = "%Y-%m-%d %H:%M:%S day=%j mon=%b (%B) dow=%a (%A) ampm=%I%p y2=%y 100%%"
    df = spark.createDataFrame([(s,) for s in stamps], "t timestamp")
    out = zed_transform(f's := strftime("{fmt}", t) | cut t, s')(df).collect()
    want = {s: s.strftime(fmt) for s in stamps}
    for r in out:
        # Python pads %j to 3 and %I to 2; Java DDD/hh do the same.
        # %p case: Python gives AM/PM, Java 'a' gives AM/PM — equal.
        assert r["s"] == want[r["t"]], (r["t"], r["s"], want[r["t"]])


def test_grok_custom_definitions(spark):
    df = spark.createDataFrame([("order-1234 shipped",)], "line string")
    out = zed_transform(
        'g := grok("%{ORDERID:oid} %{WORD:what}", line, '
        '"ORDERID order-[0-9]+") | cut g'
    )(df).collect()[0]["g"]
    assert out["oid"] == "order-1234" and out["what"] == "shipped"


def test_grok_bad_definition_line_errors(spark):
    df = spark.createDataFrame([("x",)], "line string")
    with pytest.raises(ZedCompileError, match="NAME PATTERN"):
        zed_transform('g := grok("%{A:a}", line, "JUSTONETOKEN") | cut g')(df)


def test_java_only_pattern_compiles_and_python_only_rejects(spark):
    """Dialect parity (r7 advice): a Java-only \\p{} property class must
    COMPILE (Python re would reject it), and a Python-only (?P<name>)
    group must fail at compile time with a ZedCompileError, not a
    mid-job executor PatternSyntaxException."""
    df = spark.createDataFrame([(1, "Abc"), (2, "123")], "id long, s string")
    out = compile_query(
        spark, r"from t | yield {id: id, m: regexp(/\p{Lu}/, s)}", tables={"t": df}
    )
    got = {r["id"]: r["m"] for r in out.collect()}
    assert got[1] is not None and got[2] is None
    with pytest.raises(ZedCompileError, match="java regex"):
        compile_query(
            spark, r"from t | yield {m: regexp(/(?P<x>a)/, s)}", tables={"t": df}
        )
    # search terms validate too
    with pytest.raises(ZedCompileError, match="java regex"):
        compile_query(spark, r"from t | /(?P<x>a)/", tables={"t": df})


def test_regex_infrastructure_errors_propagate():
    """_java_regex_groups must report ZedCompileError only for genuine
    pattern-syntax failures; a transient gateway error on a VALID
    pattern must propagate as-is, not be misreported as 'bad pattern'
    (ADVICE r8)."""
    from types import SimpleNamespace

    from zinger_spark.zedql.compiler import _java_regex_groups

    class BrokenPattern:
        @staticmethod
        def compile(_):
            raise ConnectionError("py4j gateway dropped")

    fake_df = SimpleNamespace(
        sparkSession=SimpleNamespace(
            _jvm=SimpleNamespace(
                java=SimpleNamespace(
                    util=SimpleNamespace(regex=SimpleNamespace(Pattern=BrokenPattern))
                )
            )
        )
    )
    with pytest.raises(ConnectionError, match="gateway dropped"):
        _java_regex_groups(fake_df, r"(valid)", "regexp")


def test_unflatten_two_flatten_schemas_is_ambiguous(spark):
    """r11 advice: two flatten() calls over DIFFERENT records in one
    program made unflatten rebuild against whichever compiled last
    (silent wrong shape).  Now it errors loudly."""
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    with pytest.raises(ZedCompileError, match="ambiguous"):
        zed_transform(
            "f1 := flatten({a: a}) | f2 := flatten({b: b}) "
            "| u := unflatten(f1) | cut u"
        )(df)
    # same schema flattened twice stays unambiguous
    out = zed_transform(
        "f1 := flatten({a: a}) | f2 := flatten({a: a}) "
        "| u := unflatten(f1) | cut u"
    )(df)
    assert out.collect()[0]["u"].asDict() == {"a": 1}


def test_over_scope_inner_sort_stable_on_ties(spark):
    """r11 advice: inner sort ranked ties nondeterministically (bare
    row_number over only the user keys).  Zed's sort is stable — equal
    keys keep their prior element order, so collecting a DIFFERENT
    field than the sort key is deterministic."""
    df = spark.createDataFrame(
        [(1, [("a", 5), ("b", 5), ("c", 5), ("d", 1)])],
        "id long, items array<struct<item:string,price:long>>",
    )
    out = zed_transform(
        "over items with d = id "
        "=> ( sort -r price | names := collect(item) by d )"
    )(df)
    # all three price-5 ties keep array order; price-1 sorts last
    assert list(out.collect()[0]["names"]) == ["a", "b", "c", "d"]
