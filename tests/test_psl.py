"""Public Suffix List machinery: parser, rule grammar (normal /
wildcard / exception, longest match), private domains, punycode, and
the registered_domain column function over it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zinger_spark.functions.net import registered_domain
from zinger_spark.functions.psl import (
    BUNDLED_PSL,
    get_psl,
    idna_ascii,
    parse_psl,
    take_expr,
)


def _cut(spark, hosts: list[str]) -> list[str]:
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r["d"]
        for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]


CASES = [
    # plain TLDs (implicit default rule)
    ("www.example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("example.io", "example.io"),
    # multi-level ICANN suffixes
    ("www.bbc.co.uk", "bbc.co.uk"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("example.ac.uk", "example.ac.uk"),
    ("shop.example.com.au", "example.com.au"),
    ("www.city.example.co.jp", "example.co.jp"),
    # 3-label suffix (k12 hierarchy)
    ("www.school.k12.ma.us", "school.k12.ma.us"),
    # wildcard rule *.ck: any 2nd level is a suffix
    ("www.example.foo.ck", "example.foo.ck"),
    # exception !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    # jp geographic wildcard + city exception
    ("blog.example.chuo.kawasaki.jp", "example.chuo.kawasaki.jp"),
    ("www.city.kawasaki.jp", "city.kawasaki.jp"),
    # private domains: each tenant is a publisher
    ("alice.github.io", "alice.github.io"),
    ("www.alice.github.io", "alice.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("shard7.s3.amazonaws.com", "shard7.s3.amazonaws.com"),
    # punycode TLD (рф)
    ("xn--e1afmkfd.xn--p1ai", "xn--e1afmkfd.xn--p1ai"),
    ("www.xn--e1afmkfd.xn--p1ai", "xn--e1afmkfd.xn--p1ai"),
    # host IS a public suffix: unchanged
    ("co.uk", "co.uk"),
    ("com", "com"),
    ("github.io", "github.io"),
]


def test_registered_domain_psl_cases(spark):
    hosts = [h for h, _ in CASES]
    want = [w for _, w in CASES]
    assert _cut(spark, hosts) == want


def test_registered_domain_case_insensitive(spark):
    """Hostnames are case-insensitive (RFC 4343): a mixed-case host
    must hit the same rules as its lowercase form and come back as the
    canonical lowercase registered domain (regression: mixed case fell
    through every rule to the default 2-label cut)."""
    assert _cut(
        spark,
        ["WWW.Example.CO.UK", "Alice.GitHub.IO", "WWW.CK", "News.BBC.co.uk"],
    ) == ["example.co.uk", "alice.github.io", "www.ck", "bbc.co.uk"]


def test_parser_sections_and_kinds():
    psl = parse_psl(BUNDLED_PSL)
    assert "co.uk" in psl.normals[2]
    assert "k12.ma.us" in psl.normals[3]
    assert "ck" in psl.wildcards[1]
    assert "kawasaki.jp" in psl.wildcards[2]
    assert "www.ck" in psl.exceptions[2]
    assert "github.io" in psl.normals[2]  # private section included
    no_private = parse_psl(BUNDLED_PSL, include_private=False)
    assert "github.io" not in no_private.normals.get(2, frozenset())
    assert "co.uk" in no_private.normals[2]


def test_parser_idna_lines():
    # unicode rules in the file are matched in punycode form
    psl = parse_psl("// x\n中国\n")
    assert "xn--fiqs8s" in psl.normals[1]
    assert idna_ascii("пример.рф") == "xn--e1afmkfd.xn--p1ai"
    assert idna_ascii("Example.COM.") == "example.com"


def test_env_file_override(spark, tmp_path, monkeypatch):
    """$ZINGER_PSL_FILE swaps in a full published list without code
    changes — the mechanism the full-PSL deployment uses."""
    custom = tmp_path / "psl.dat"
    custom.write_text("// custom\nzz\nfoo.zz\n")
    monkeypatch.setenv("ZINGER_PSL_FILE", str(custom))
    psl = get_psl()
    assert "foo.zz" in psl.normals[2]
    df = spark.createDataFrame([("a.b.foo.zz",), ("www.bbc.co.uk",)], "host string")
    got = [
        r["d"]
        for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]
    # co.uk is NOT in the custom list -> the default '*' rule applies
    # and the 2-label cut lands on co.uk itself
    assert got == ["b.foo.zz", "co.uk"]


def test_large_list_sql_function_path(spark, tmp_path, monkeypatch):
    """Above _SQL_FN_THRESHOLD rules the matcher compiles through a
    once-per-session SQL scalar function (the full-published-list
    path): identical results to the column form on the grammar cases,
    no Python in the plan, and the registration is cached."""
    from zinger_spark.functions import psl as pslmod

    # the bundled rules (grammar coverage) + enough synthetic ones to
    # cross the threshold
    synth = "\n".join(f"co{i:04d}.zz" for i in range(400))
    custom = tmp_path / "big_psl.dat"
    custom.write_text(pslmod.BUNDLED_PSL + "\n// synth\nzz\n" + synth + "\n")
    monkeypatch.setenv("ZINGER_PSL_FILE", str(custom))
    pslmod._load_file.cache_clear()
    psl = pslmod.get_psl()
    assert pslmod._psl_size(psl) > pslmod._SQL_FN_THRESHOLD

    hosts = [h for h, _ in CASES] + ["a.b.co0042.zz", "WWW.Example.CO.UK"]
    want = [w for _, w in CASES] + ["b.co0042.zz", "example.co.uk"]
    assert _cut(spark, hosts) == want

    # plan stays JVM-only (the SQL function inlines, no Python UDF)
    df = spark.createDataFrame([("x.co0001.zz",)], "host string")
    out = df.select(registered_domain(F.col("host")).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # second build reuses the registered function (cache hit)
    before = len(pslmod._SQL_FN_REGISTERED)
    df.select(registered_domain(F.col("host")).alias("d")).collect()
    assert len(pslmod._SQL_FN_REGISTERED) == before


def test_take_expr_is_pure_jvm(spark):
    """The PSL cut must stay inside whole-stage codegen: no UDF, no
    exchange in the plan."""
    df = spark.range(100).selectExpr(
        "concat('host', id % 7, '.example.co.uk') AS host"
    )
    out = df.select(registered_domain(F.col("host")).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
