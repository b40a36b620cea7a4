"""zedql — a compiler from the reference's Zed query dialect to Spark
DataFrame plans.

The reference does not execute queries itself: it *generates* Zed query
text (etl/build.go:86-109) and hands it to a Zed lake
(fifo/lake.go:50-56).  ``zedql`` closes that loop on Spark: the same
generated program text (see ztests/etl-zed.yaml for the full golden
output) parses and compiles here into a DataFrame plan, so a reference
user's Zed — both whole programs and the user-authored ``zed:`` rule
blocks of transform YAMLs (demo/invoices.yaml) — runs verbatim.

Public API:
  parse(text)                    -> ast.Seq (plus leading type decls)
  compile_query(spark, text, *,
      tables=..., pools=...)     -> DataFrame
  compile_rule_seq(df, text, decls) -> DataFrame  (ETL rule blocks)
  looks_like_zed(text)           -> bool (dialect sniff for YAML rules)
"""

from zinger_spark.zedql.parser import parse, parse_expr_text, parse_type, ZedSyntaxError
from zinger_spark.zedql.compiler import (
    ZedCompileError,
    compile_predicate,
    compile_query,
    compile_rule_seq,
    looks_like_zed,
    zed_transform,
)

__all__ = [
    "parse",
    "parse_expr_text",
    "parse_type",
    "ZedSyntaxError",
    "ZedCompileError",
    "compile_predicate",
    "compile_query",
    "compile_rule_seq",
    "looks_like_zed",
    "zed_transform",
]
