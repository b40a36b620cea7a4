"""AST for the Zed subset the reference emits and documents.

Node inventory maps 1:1 onto the operator surface inventoried in
SURVEY.md §2.B: the generated program shapes (etl/build.go:86-109 —
from/fork/switch/join/anti-join/sort/yield/cast/type-decl) plus the
user-block shapes of demo/invoices.yaml (record literals, ``:=`` put,
``cut``/``drop``/``head``/``tail``/aggregates from README.md:117-156
and design.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# Expressions


class Expr:
    pass


@dataclass
class Lit(Expr):
    value: object  # str | int | float | bool | None


@dataclass
class RegexLit(Expr):
    """``/pattern/`` literal.  In search position it is shorthand for
    ``grep(/pattern/, this)`` (match any string value in the record);
    as grep()'s first argument it is the pattern itself."""

    pattern: str


@dataclass
class DurationLit(Expr):
    seconds: float


@dataclass
class TimeLit(Expr):
    iso: str  # RFC3339 text as written


@dataclass
class Path(Expr):
    """Dotted field path; ``this`` is Path([])."""

    parts: list[str]


@dataclass
class Bin(Expr):
    op: str  # == != < <= > >= + - * / % and or in
    left: Expr
    right: Expr


@dataclass
class Not(Expr):
    expr: Expr


@dataclass
class Neg(Expr):
    expr: Expr


@dataclass
class Call(Expr):
    name: str
    args: list[Expr]


@dataclass
class RecordLit(Expr):
    fields: list[tuple[str, Expr]]


@dataclass
class ArrayLit(Expr):
    items: list[Expr]


@dataclass
class MapLit(Expr):
    pairs: list[tuple[Expr, Expr]]


@dataclass
class Index(Expr):
    base: Expr
    index: Expr


@dataclass
class TypeName(Expr):
    """``<done>`` / ``<int64>`` — a type literal."""

    name: str


@dataclass
class CastExpr(Expr):
    """cast(e, done) / cast(e, <int64>) / cast(null, typeof(x))."""

    expr: Expr
    to: Expr  # TypeName | Path (bare declared-type name) | Call('typeof', ..)


@dataclass
class IsType(Expr):
    """is(<name>) — named-type test on the row (etl/build.go:113)."""

    name: str


@dataclass
class Cond(Expr):
    cond: Expr
    then: Expr
    other: Expr


# --------------------------------------------------------------------------
# Pipeline operators


class Op:
    pass


@dataclass
class Seq:
    ops: list[Op]


@dataclass
class FromLeg:
    source: str  # pool or table name
    seq: Seq  # possibly-empty per-leg pipeline (the `=> filter` part)


@dataclass
class OpFrom(Op):
    legs: list[FromLeg]


@dataclass
class OpFork(Op):
    branches: list[Seq]


@dataclass
class SwitchCase:
    cond: Expr | None  # None = default
    seq: Seq


@dataclass
class OpSwitch(Op):
    subject: Expr | None  # `switch expr ( case <const> ...)` form
    cases: list[SwitchCase]


@dataclass
class OpJoin(Op):
    kind: str  # inner | anti | left
    left_key: Expr
    right_key: Expr
    assignments: list[tuple[list[str], Expr]] = field(default_factory=list)


@dataclass
class SortKey:
    expr: Expr
    desc: bool = False


@dataclass
class OpSort(Op):
    keys: list[SortKey]


@dataclass
class OpHead(Op):
    n: int


@dataclass
class OpTail(Op):
    n: int


@dataclass
class OpCut(Op):
    paths: list[tuple[list[str], Expr | None]]  # (target path, optional expr)


@dataclass
class OpDrop(Op):
    paths: list[list[str]]


@dataclass
class OpWhere(Op):
    expr: Expr


@dataclass
class OpYield(Op):
    exprs: list[Expr]


@dataclass
class OpPut(Op):
    assignments: list[tuple[list[str], Expr]]


@dataclass
class OpRename(Op):
    pairs: list[tuple[list[str], list[str]]]  # new := old


@dataclass
class OpUniq(Op):
    count: bool = False  # -c: annotate each value with its multiplicity


@dataclass
class OpFuse(Op):
    pass


@dataclass
class OpSample(Op):
    # `sample` (aliased `shapes` after the rename in the language's
    # successor docs): one representative value per distinct shape.
    pass


@dataclass
class OpPass(Op):
    pass


@dataclass
class OpOver(Op):
    exprs: list[Expr]
    # lateral scope: `over e with a=expr, b=expr => ( seq )` — bindings
    # carry parent-row context into the subquery, which runs over each
    # input value's nested sequence independently
    bindings: list[tuple[str, Expr]] | None = None
    seq: "Seq | None" = None


@dataclass
class OpTop(Op):
    limit: int
    keys: list["SortKey"]


@dataclass
class AggSpec:
    name: str | None  # output field; None = function name
    func: str
    arg: Expr | None
    where: Expr | None = None


@dataclass
class OpSummarize(Op):
    aggs: list[AggSpec]
    by: list[tuple[str, Expr]]  # (output name, expr)


@dataclass
class TypeDecl:
    name: str
    # Spark DataType, built by parse_type; typed as object to keep the
    # AST module import-light.
    spark_type: object


@dataclass
class ConstDecl:
    """`const name = expr` (demo/update.zed:1-8)."""

    name: str
    expr: Expr


@dataclass
class Program:
    decls: list[TypeDecl]
    seq: Seq
    consts: list[ConstDecl] = field(default_factory=list)
