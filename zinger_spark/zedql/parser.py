"""Tokenizer + recursive-descent parser for the Zed subset.

The grammar covers every construct in the reference's generated programs
(etl/build.go:86-109, golden text in ztests/etl-zed.yaml) and user rule
blocks (demo/invoices.yaml, README.md:285-316):

  program   := typedecl* seq
  typedecl  := 'type' NAME '=' type
  seq       := op ('|' op)*
  op        := from | fork | switch | join | sort | head | tail | cut
             | drop | where | yield | put | rename | uniq | fuse | pass
             | summarize | bare-expr | path ':=' expr (, ...)
  from      := 'from' '(' ( 'pool'|'file' STRING|NAME ('=>' seq)? )+ ')'
             | 'from' NAME|STRING
  fork      := 'fork' '(' ('=>' seq)+ ')'
  switch    := 'switch' expr? '(' ('case' expr '=>' seq)* ('default' '=>' seq)? ')'
  join      := ('anti'|'left'|'inner')? 'join' 'on' expr '=' expr (path ':=' expr)*

Zed's search syntax allows juxtaposed boolean terms as an implicit AND
("is(<done>) kafka.topic==..." — etl/build.go:116) which the bare-expr
op honors.  ``/pattern/`` regex literals are supported in search
position (shorthand for ``grep(/re/, this)``) and as grep()'s first
argument; a ``/`` after a value-ending token still lexes as division.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from zinger_spark.zedql import ast


class ZedSyntaxError(ValueError):
    pass


# --------------------------------------------------------------------------
# Tokenizer

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|//[^\n]*)
    | (?P<string>"(?:\\.|[^"\\])*")
    | (?P<time>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?)
    | (?P<duration>\d+(?:\.\d+)?(?:ns|us|ms|s|m|h|d)\b)
    | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+)
    | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<punct>=>|:=|==|!=|<=|>=|\|\[|\|\{|\]\||\}\||[()\[\]{}<>.,:;|?+\-*/%=!])
    """,
    re.VERBOSE,
)

_STRING_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    '"': '"',
    "\\": "\\",
    "/": "/",
}


def _unquote(tok: str) -> str:
    out = []
    i = 1
    while i < len(tok) - 1:
        c = tok[i]
        if c == "\\" and i + 1 < len(tok) - 1:
            nxt = tok[i + 1]
            out.append(_STRING_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(text: str) -> list[tuple[str, str]]:
    return _tokenize_pos(text)[0]


def _regex_context(toks: list[tuple[str, str]]) -> bool:
    """A ``/`` starts a regex literal (not division) unless the
    previous token could end a value — the standard JS-style
    disambiguation.  ``| /foo/``, ``grep(/foo/, s)`` parse as regex;
    ``a / b``, ``(x+1) / 2`` parse as division."""
    if not toks:
        return True
    kind, val = toks[-1]
    if kind in ("number", "string", "time", "duration"):
        return False
    if kind == "ident" and val not in ("and", "or", "not", "in", "case", "where"):
        return False
    return val not in (")", "]", "}", "]|", "}|")


def _scan_regex(text: str, start: int) -> tuple[str, int]:
    """Scan ``/pattern/`` from ``start`` (at the opening slash);
    ``\\/`` escapes a slash, all other backslashes pass through to the
    regex engine verbatim."""
    i = start + 1
    out: list[str] = []
    while i < len(text):
        c = text[i]
        if c == "\\" and i + 1 < len(text) and text[i + 1] == "/":
            out.append("/")
            i += 2
            continue
        if c == "/":
            return "".join(out), i + 1
        if c == "\n":
            break
        out.append(c)
        i += 1
    raise ZedSyntaxError(f"unterminated regex literal at offset {start}")


def _tokenize_pos(text: str) -> tuple[list[tuple[str, str]], list[int]]:
    toks: list[tuple[str, str]] = []
    offs: list[int] = []
    pos = 0
    while pos < len(text):
        if (
            text[pos] == "/"
            and not text.startswith("//", pos)
            and _regex_context(toks)
        ):
            pat, end = _scan_regex(text, pos)
            toks.append(("regex", pat))
            offs.append(pos)
            pos = end
            continue
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ZedSyntaxError(f"unexpected character {text[pos]!r} at offset {pos}")
        start, pos = m.start(), m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append((kind, m.group()))
        offs.append(start)
    toks.append(("eof", ""))
    offs.append(len(text))
    return toks, offs


# --------------------------------------------------------------------------
# Type syntax -> Spark types (mapping per SURVEY.md §1.2, i.e. the
# reference's own codec ladder zavro/schema.go:145-172)

_PRIMS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bool": T.BooleanType(),
    "bytes": T.BinaryType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "time": T.TimestampType(),
    "duration": T.DayTimeIntervalType(),
    "ip": T.StringType(),
    "net": T.StringType(),
    "type": T.StringType(),
    "null": T.NullType(),
}


class _Parser:
    def __init__(
        self,
        toks: list[tuple[str, str]],
        decls: dict[str, T.DataType] | None = None,
        offsets: list[int] | None = None,
    ):
        self.toks = toks
        self.offsets = offsets
        self.i = 0
        self.decls: dict[str, T.DataType] = dict(decls or {})

    def _err(self, msg: str) -> ZedSyntaxError:
        if self.offsets is not None:
            j = min(self.i, len(self.offsets) - 1)
            return ZedSyntaxError(f"{msg} (at offset {self.offsets[j]})")
        return ZedSyntaxError(msg)

    # -- token helpers ----------------------------------------------------
    def peek(self, k: int = 0) -> tuple[str, str]:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def at(self, value: str) -> bool:
        return self.peek()[1] == value and self.peek()[0] in ("punct", "ident")

    def at_ident(self, value: str) -> bool:
        return self.peek() == ("ident", value)

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def expect(self, value: str) -> None:
        kind, tok = self.peek()
        if tok != value or kind == "eof":
            raise self._err(f"expected {value!r}, found {tok!r}")
        self.take()

    def expect_ident(self) -> str:
        kind, tok = self.take()
        if kind != "ident":
            raise self._err(f"expected identifier, found {tok!r}")
        return tok

    # -- types ------------------------------------------------------------
    def parse_type(self) -> T.DataType:
        kind, tok = self.peek()
        if tok == "{":
            self.take()
            fields = []
            while not self.at("}"):
                name = self._field_name()
                self.expect(":")
                fields.append(T.StructField(name, self.parse_type(), True))
                if self.at(","):
                    self.take()
            self.expect("}")
            return T.StructType(fields)
        if tok == "[":
            self.take()
            inner = self.parse_type()
            self.expect("]")
            return T.ArrayType(inner, True)
        if tok == "|[":  # set -> array (the reference's own lossy move,
            self.take()  # zavro/encoder.go:85-87)
            inner = self.parse_type()
            self.expect("]|")
            return T.ArrayType(inner, True)
        if tok == "|{":
            self.take()
            kt = self.parse_type()
            self.expect(":")
            vt = self.parse_type()
            self.expect("}|")
            return T.MapType(kt, vt, True)
        if kind == "ident":
            self.take()
            if tok in _PRIMS:
                return _PRIMS[tok]
            if tok in self.decls:
                return self.decls[tok]
            raise self._err(f"unknown type name {tok!r}")
        raise self._err(f"expected type, found {tok!r}")

    def _field_name(self) -> str:
        kind, tok = self.take()
        if kind in ("ident", "string"):
            return _unquote(tok) if kind == "string" else tok
        raise self._err(f"expected field name, found {tok!r}")

    # -- expressions ------------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        return self._ternary()

    def _ternary(self) -> ast.Expr:
        cond = self._or()
        if self.at("?"):
            self.take()
            then = self._ternary()
            self.expect(":")
            other = self._ternary()
            return ast.Cond(cond, then, other)
        return cond

    def _or(self) -> ast.Expr:
        left = self._and()
        while self.at_ident("or"):
            self.take()
            left = ast.Bin("or", left, self._and())
        return left

    def _and(self) -> ast.Expr:
        left = self._not()
        while self.at_ident("and"):
            self.take()
            left = ast.Bin("and", left, self._not())
        return left

    def _not(self) -> ast.Expr:
        if self.at_ident("not") or self.at("!"):
            self.take()
            return ast.Not(self._not())
        return self._cmp()

    def _cmp(self) -> ast.Expr:
        left = self._add()
        kind, tok = self.peek()
        if tok in ("==", "!=", "<", "<=", ">", ">=") and kind == "punct":
            self.take()
            return ast.Bin(tok, left, self._add())
        if self.at_ident("in") and self.peek(1)[1] != ".":
            # binary `in` only when the next token is not `.`: `in` is
            # also the conventional field name for stateless rule inputs
            # (etl/build.go:169 wraps the record as {in:this}), so
            # `in.value.after.ID` must stay a path.
            self.take()
            return ast.Bin("in", left, self._add())
        return left

    def _add(self) -> ast.Expr:
        left = self._mul()
        while True:
            kind, tok = self.peek()
            if kind == "punct" and tok in ("+", "-"):
                self.take()
                left = ast.Bin(tok, left, self._mul())
            else:
                return left

    def _mul(self) -> ast.Expr:
        left = self._unary()
        while True:
            kind, tok = self.peek()
            if kind == "punct" and tok in ("*", "/", "%"):
                self.take()
                left = ast.Bin(tok, left, self._unary())
            else:
                return left

    def _unary(self) -> ast.Expr:
        if self.at("-"):
            self.take()
            return ast.Neg(self._unary())
        return self._postfix()

    def _postfix(self) -> ast.Expr:
        e = self._primary()
        while True:
            kind, tok = self.peek()
            if tok == "." and kind == "punct":
                self.take()
                name = self.expect_ident()
                if isinstance(e, ast.Path):
                    e = ast.Path(e.parts + [name])
                else:
                    e = ast.Index(e, ast.Lit(name))
            elif tok == "[" and kind == "punct":
                self.take()
                idx = self.parse_expr()
                self.expect("]")
                e = ast.Index(e, idx)
            else:
                return e

    def _primary(self) -> ast.Expr:
        kind, tok = self.peek()
        if kind == "regex":
            self.take()
            return ast.RegexLit(tok)
        if kind == "string":
            self.take()
            return ast.Lit(_unquote(tok))
        if kind == "number":
            self.take()
            return ast.Lit(float(tok) if ("." in tok or "e" in tok or "E" in tok) else int(tok))
        if kind == "time":
            self.take()
            return ast.TimeLit(tok)
        if kind == "duration":
            self.take()
            m = re.fullmatch(r"(\d+(?:\.\d+)?)(ns|us|ms|s|m|h|d)", tok)
            scale = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3,
                     "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}[m.group(2)]
            return ast.DurationLit(float(m.group(1)) * scale)
        if tok == "(":
            self.take()
            e = self.parse_expr()
            self.expect(")")
            return e
        if tok == "{":
            return self._record_lit()
        if tok == "[":
            self.take()
            items = []
            while not self.at("]"):
                items.append(self.parse_expr())
                if self.at(","):
                    self.take()
            self.expect("]")
            return ast.ArrayLit(items)
        if tok == "|[":
            self.take()
            items = []
            while not self.at("]|"):
                items.append(self.parse_expr())
                if self.at(","):
                    self.take()
            self.expect("]|")
            return ast.ArrayLit(items)  # set literal -> array
        if tok == "|{":
            self.take()
            pairs = []
            while not self.at("}|"):
                k = self.parse_expr()
                self.expect(":")
                pairs.append((k, self.parse_expr()))
                if self.at(","):
                    self.take()
            self.expect("}|")
            return ast.MapLit(pairs)
        if tok == "<" and kind == "punct":
            return self._type_literal()
        if kind == "ident":
            if tok == "true":
                self.take()
                return ast.Lit(True)
            if tok == "false":
                self.take()
                return ast.Lit(False)
            if tok == "null":
                self.take()
                return ast.Lit(None)
            if tok == "this":
                self.take()
                return ast.Path([])
            self.take()
            if self.at("("):
                return self._call(tok)
            return ast.Path([tok])
        raise self._err(f"expected expression, found {tok!r}")

    def _type_literal(self) -> ast.TypeName:
        self.expect("<")
        name = self.expect_ident()
        self.expect(">")
        return ast.TypeName(name)

    def _call(self, name: str) -> ast.Expr:
        self.expect("(")
        args: list[ast.Expr] = []
        while not self.at(")"):
            args.append(self.parse_expr())
            if self.at(","):
                self.take()
        self.expect(")")
        if name == "is":
            if len(args) == 1 and isinstance(args[0], ast.TypeName):
                return ast.IsType(args[0].name)
            raise self._err("is() takes one <type> argument")
        if name == "cast":
            if len(args) != 2:
                raise self._err("cast() takes (expr, type)")
            return ast.CastExpr(args[0], args[1])
        return ast.Call(name, args)

    def _record_lit(self) -> ast.RecordLit:
        self.expect("{")
        fields: list[tuple[str, ast.Expr]] = []
        while not self.at("}"):
            # shorthand {a.b.c} -> field c:=a.b.c; {name:expr} general
            kind, tok = self.peek()
            if kind in ("ident", "string") and self.peek(1)[1] == ":":
                name = self._field_name()
                self.expect(":")
                fields.append((name, self.parse_expr()))
            else:
                e = self.parse_expr()
                if not isinstance(e, ast.Path) or not e.parts:
                    raise self._err("record literal field needs a name")
                fields.append((e.parts[-1], e))
            if self.at(","):
                self.take()
        self.expect("}")
        return ast.RecordLit(fields)

    # -- operators --------------------------------------------------------

    AGG_FUNCS = {
        "count",
        "sum",
        "min",
        "max",
        "avg",
        "collect",
        "union",
        "and",
        "or",
        "any",
        "every",
        "dcount",
    }

    OP_KEYWORDS = {
        "from",
        "fork",
        "switch",
        "join",
        "anti",
        "inner",
        "sort",
        "head",
        "tail",
        "cut",
        "drop",
        "where",
        "yield",
        "put",
        "rename",
        "uniq",
        "fuse",
        "pass",
        "summarize",
        "type",
        "case",
        "default",
        "pool",
        "file",
        "over",
        "top",
        "sample",
        "shapes",
        "combine",
        "merge",
    }

    def parse_program(self) -> ast.Program:
        decls: list[ast.TypeDecl] = []
        consts: list[ast.ConstDecl] = []
        while self.at_ident("type") or self.at_ident("const"):
            kw = self.take()[1]
            name = self.expect_ident()
            self.expect("=")
            if kw == "type":
                st = self.parse_type()
                self.decls[name] = st
                decls.append(ast.TypeDecl(name, st))
            else:  # const name = expr [;]  (demo/update.zed:1-8)
                consts.append(ast.ConstDecl(name, self.parse_expr()))
            if self.at(";"):
                self.take()
        seq = self.parse_seq(stop=frozenset())
        if self.peek()[0] != "eof":
            raise self._err(f"unexpected trailing input at {self.peek()[1]!r}")
        return ast.Program(decls, seq, consts)

    def parse_seq(self, stop: frozenset[str]) -> ast.Seq:
        ops: list[ast.Op] = []
        while True:
            kind, tok = self.peek()
            if kind == "eof" or tok in (")",) or (kind == "ident" and tok in stop):
                break
            if tok == "=>" and "=>" in stop:
                break
            if tok == "|" and kind == "punct":
                self.take()
                continue
            op = self.parse_op(stop)
            if op is not None:
                ops.append(op)
        return ast.Seq(ops)

    def parse_op(self, stop: frozenset[str]) -> ast.Op | None:
        kind, tok = self.peek()
        if kind == "ident":
            handler = getattr(self, f"_op_{tok}", None)
            if handler and tok in self.OP_KEYWORDS:
                return handler(stop)
            if tok in ("anti", "inner", "left") and self.peek(1) == ("ident", "join"):
                return self._op_join(stop)
            # shaping operator forms: `shape <t>` == `yield shape(this, <t>)`
            # (dispatched ONLY on a following type literal, so bare fields
            # named shape/fill/crop/order stay usable in expressions)
            if tok in ("shape", "fill", "crop", "order") and self.peek(1) == (
                "punct",
                "<",
            ):
                self.take()
                t = self._type_literal()
                return ast.OpYield([ast.Call(tok, [ast.Path([]), t])])
            if tok in self.AGG_FUNCS and self.peek(1)[1] == "(":
                return self._summarize(stop)
            # named aggregate head: `hot:=count() where ... , n:=count()`
            if (
                self.peek(1)[1] == ":="
                and self.peek(2)[0] == "ident"
                and self.peek(2)[1] in self.AGG_FUNCS
                and self.peek(3)[1] == "("
            ):
                return self._summarize(stop)
        # `name := agg(...)` summarize vs put: decided after parsing.
        expr = self.parse_expr()
        if self.at(":="):
            assigns = [(self._as_path(expr), self._take_assign())]
            while self.at(","):
                self.take()
                lhs = self.parse_expr()
                assigns.append((self._as_path(lhs), self._take_assign()))
            if any(
                isinstance(rhs, ast.Call) and rhs.name in self.AGG_FUNCS
                for _, rhs in assigns
            ):
                aggs = []
                for path, rhs in assigns:
                    if not (isinstance(rhs, ast.Call) and rhs.name in self.AGG_FUNCS):
                        raise self._err("cannot mix aggregates and puts")
                    aggs.append(
                        ast.AggSpec(".".join(path), rhs.name, rhs.args[0] if rhs.args else None)
                    )
                return ast.OpSummarize(aggs, self._by_clause())
            return ast.OpPut(assigns)
        # bare expression: implicit-and juxtaposition (Zed search syntax)
        while self._starts_expr(stop):
            expr = ast.Bin("and", expr, self.parse_expr())
        return ast.OpWhere(expr) if _is_predicate(expr) else ast.OpYield([expr])

    def _take_assign(self) -> ast.Expr:
        self.expect(":=")
        return self.parse_expr()

    def _as_path(self, e: ast.Expr) -> list[str]:
        if isinstance(e, ast.Path) and e.parts:
            return e.parts
        raise self._err("assignment target must be a field path")

    def _starts_expr(self, stop: frozenset[str]) -> bool:
        kind, tok = self.peek()
        if kind in ("string", "number"):
            return True
        if kind == "ident":
            return tok not in self.OP_KEYWORDS and tok not in stop and tok not in ("and", "or", "in")
        if kind == "punct":
            return tok in ("(", "{", "[", "!")
        return False

    # individual operator parsers ----------------------------------------

    def _op_from(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        legs: list[ast.FromLeg] = []
        if self.at("("):
            self.take()
            leg_stop = frozenset({"pool", "file", "=>"})
            while not self.at(")"):
                kw = self.peek()[1]
                if kw in ("pool", "file"):
                    self.take()
                name = self._source_name()
                seq = ast.Seq([])
                if self.at("=>"):
                    self.take()
                    seq = self.parse_seq(leg_stop)
                legs.append(ast.FromLeg(name, seq))
            self.expect(")")
        else:
            legs.append(ast.FromLeg(self._source_name(), ast.Seq([])))
        return ast.OpFrom(legs)

    def _source_name(self) -> str:
        kind, tok = self.take()
        if kind == "string":
            return _unquote(tok)
        if kind == "ident":
            return tok
        raise self._err(f"expected pool/table name, found {tok!r}")

    def _op_fork(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        self.expect("(")
        branches: list[ast.Seq] = []
        while not self.at(")"):
            self.expect("=>")
            branches.append(self.parse_seq(frozenset({"=>"})))
        self.expect(")")
        return ast.OpFork(branches)

    def _op_switch(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        subject = None
        if not self.at("("):
            subject = self.parse_expr()
        self.expect("(")
        cases: list[ast.SwitchCase] = []
        case_stop = frozenset({"case", "default"})
        while not self.at(")"):
            kind, tok = self.take()
            if tok == "case":
                cond = self.parse_expr()
                self.expect("=>")
                cases.append(ast.SwitchCase(cond, self.parse_seq(case_stop)))
            elif tok == "default":
                self.expect("=>")
                cases.append(ast.SwitchCase(None, self.parse_seq(case_stop)))
            else:
                raise self._err(f"expected case/default, found {tok!r}")
        self.expect(")")
        return ast.OpSwitch(subject, cases)

    def _op_join(self, stop: frozenset[str]) -> ast.Op:
        kind = "inner"
        if self.peek()[1] in ("anti", "inner", "left"):
            kind = self.take()[1]
        self.expect("join")
        self.expect("on")
        left_key = self._join_operand()
        self.expect("=")
        right_key = self._join_operand()
        assigns: list[tuple[list[str], ast.Expr]] = []
        while self.peek()[0] == "ident" and self.peek(1)[1] == ":=" and self.peek()[1] not in self.OP_KEYWORDS:
            lhs = ast.Path([self.take()[1]])
            assigns.append((self._as_path(lhs), self._take_assign()))
            if self.at(","):
                self.take()
        return ast.OpJoin(kind, left_key, right_key, assigns)

    def _join_operand(self) -> ast.Expr:
        # key expressions stop at a single `=` (join-on syntax,
        # etl/build.go:189-196), so use the additive tier.
        return self._add()

    def _op_sort(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        reverse = False
        if self.at("-"):
            self.take()
            flag = self.expect_ident()
            if flag != "r":
                raise self._err(f"unknown sort flag -{flag}")
            reverse = True
        keys: list[ast.SortKey] = []
        while True:
            e = self.parse_expr()
            desc = reverse
            if self.at_ident("desc"):
                self.take()
                desc = True
            elif self.at_ident("asc"):
                self.take()
            keys.append(ast.SortKey(e, desc))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpSort(keys)

    def _op_head(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpHead(self._opt_count())

    def _op_tail(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpTail(self._opt_count())

    def _opt_count(self) -> int:
        if self.peek()[0] == "number":
            tok = self.peek()[1]
            try:
                n = int(tok)
            except ValueError:
                raise self._err(f"head/tail count must be an integer, found {tok!r}")
            self.take()
            return n
        return 1

    def _op_cut(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        if self.at_ident("yield"):
            # legacy `cut yield{...}` spelling (demo/etl.zed:18) — a
            # projection to exactly the yielded record
            self.take()
            return ast.OpYield([self.parse_expr()])
        paths: list[tuple[list[str], ast.Expr | None]] = []
        while True:
            e = self.parse_expr()
            if self.at(":="):
                rhs = self._take_assign()
                paths.append((self._as_path(e), rhs))
            else:
                paths.append((self._as_path(e), None))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpCut(paths)

    def _op_drop(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        paths = []
        while True:
            paths.append(self._as_path(self.parse_expr()))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpDrop(paths)

    def _op_where(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpWhere(self.parse_expr())

    def _op_yield(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        exprs = [self.parse_expr()]
        while self.at(","):
            self.take()
            exprs.append(self.parse_expr())
        return ast.OpYield(exprs)

    def _op_put(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        assigns = []
        while True:
            lhs = self.parse_expr()
            assigns.append((self._as_path(lhs), self._take_assign()))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpPut(assigns)

    def _op_rename(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        pairs = []
        while True:
            lhs = self._as_path(self.parse_expr())
            self.expect(":=")
            rhs = self._as_path(self.parse_expr())
            pairs.append((lhs, rhs))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpRename(pairs)

    def _op_sample(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpSample()

    # `shapes` — the operator's name after the sample->shapes rename in
    # the language's successor docs; same semantics here.
    def _op_shapes(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpSample()

    def _op_combine(self, stop: frozenset[str]) -> ast.Op:
        # fork/switch legs in this engine union implicitly (fuse), so the
        # explicit combine is a no-op marker — same reason fuse-after-
        # union compiles to pass.
        self.take()
        return ast.OpPass()

    def _op_merge(self, stop: frozenset[str]) -> ast.Op:
        # `merge k` — ordered combine of branches by k.  A set-oriented
        # engine realizes the interleave as a sort on the merge key
        # (branches are already unioned by the time merge runs).
        self.take()
        keys = []
        while True:
            e = self.parse_expr()
            desc = False
            if self.at_ident("desc"):
                self.take()
                desc = True
            elif self.at_ident("asc"):
                self.take()
            keys.append(ast.SortKey(e, desc))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpSort(keys)

    def _op_uniq(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        if self.at("-"):
            self.take()
            flag = self.expect_ident()
            if flag != "c":
                raise self._err(f"unknown uniq flag -{flag}")
            return ast.OpUniq(count=True)
        return ast.OpUniq()

    def _op_fuse(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpFuse()

    def _op_pass(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return ast.OpPass()

    def _op_summarize(self, stop: frozenset[str]) -> ast.Op:
        self.take()
        return self._summarize(stop)

    def _op_top(self, stop: frozenset[str]) -> ast.Op:
        # top N expr (, expr)* — the Zed top operator: the N records
        # with the greatest expr values (sort desc + head, which Spark
        # executes as TakeOrderedAndProject — a per-partition heap)
        self.take()
        kind, tok = self.peek()
        if kind != "number" or "." in tok:
            raise self._err("top needs an integer limit")
        self.take()
        limit = int(tok)
        keys = [ast.SortKey(self.parse_expr(), True)]
        while self.at(","):
            self.take()
            keys.append(ast.SortKey(self.parse_expr(), True))
        return ast.OpTop(limit, keys)

    def _op_over(self, stop: frozenset[str]) -> ast.Op:
        # over expr (, expr)* [with n=e (, n=e)*] [=> ( seq )] — un-nest
        # array values; the lateral form runs seq over each input
        # value's nested sequence with the with-bindings in scope
        self.take()
        exprs = [self.parse_expr()]
        while self.at(","):
            self.take()
            exprs.append(self.parse_expr())
        bindings: list[tuple[str, ast.Expr]] = []
        if self.at_ident("with"):
            self.take()
            while True:
                name = self.expect_ident()
                self.expect("=")
                bindings.append((name, self.parse_expr()))
                if self.at(","):
                    self.take()
                    continue
                break
        seq = None
        if self.at("=>"):
            self.take()
            self.expect("(")
            seq = self.parse_seq(frozenset({")"}))
            self.expect(")")
        if bindings and seq is None:
            raise self._err("over ... with requires a => ( ... ) scope")
        return ast.OpOver(exprs, bindings or None, seq)

    def _summarize(self, stop: frozenset[str]) -> ast.Op:
        aggs: list[ast.AggSpec] = []
        while True:
            name = None
            if self.peek()[0] == "ident" and self.peek(1)[1] == ":=":
                name = self.take()[1]
                self.take()
            func = self.expect_ident()
            if func not in self.AGG_FUNCS:
                raise self._err(f"unknown aggregate {func!r}")
            self.expect("(")
            arg = None
            if not self.at(")"):
                arg = self.parse_expr()
            self.expect(")")
            where = None
            if self.at_ident("where"):
                self.take()
                where = self.parse_expr()
            aggs.append(ast.AggSpec(name, func, arg, where))
            if self.at(","):
                self.take()
                continue
            break
        return ast.OpSummarize(aggs, self._by_clause())

    def _by_clause(self) -> list[tuple[str, ast.Expr]]:
        by: list[tuple[str, ast.Expr]] = []
        if self.at_ident("by"):
            self.take()
            while True:
                if self.peek()[0] == "ident" and self.peek(1)[1] == ":=":
                    name = self.take()[1]
                    self.take()
                    by.append((name, self.parse_expr()))
                else:
                    e = self.parse_expr()
                    if isinstance(e, ast.Path) and e.parts:
                        by.append((e.parts[-1], e))
                    elif isinstance(e, ast.Call) and e.name == "every":
                        # `by every(1h)` buckets the ts field (Zed's
                        # implicit time key); output column is ts
                        by.append(("ts", e))
                    else:
                        raise self._err("grouping expression needs name:=expr")
                if self.at(","):
                    self.take()
                    continue
                break
        return by


def _is_predicate(e: ast.Expr) -> bool:
    """Static boolean-ness for the bare-expr filter/yield split."""
    if isinstance(e, (ast.Not, ast.IsType, ast.RegexLit)):
        return True
    if isinstance(e, ast.Bin):
        return e.op in ("==", "!=", "<", "<=", ">", ">=", "and", "or", "in")
    if isinstance(e, ast.Lit):
        return isinstance(e.value, bool)
    if isinstance(e, ast.Call):
        return e.name in ("grep", "has", "missing", "is_error")
    return False


# --------------------------------------------------------------------------


def parse(text: str, decls: dict[str, T.DataType] | None = None) -> ast.Program:
    """Parse a Zed program (optional leading type decls + pipeline)."""
    try:
        toks, offs = _tokenize_pos(text)
        return _Parser(toks, decls, offsets=offs).parse_program()
    except RecursionError:
        raise ZedSyntaxError("expression nesting too deep") from None


def parse_expr_text(text: str) -> ast.Expr:
    """Parse a standalone Zed expression (e.g. a YAML rule's `where`
    clause, README.md:299), requiring the whole input to be consumed."""
    toks, offs = _tokenize_pos(text)
    p = _Parser(toks, offsets=offs)
    e = p.parse_expr()
    if p.peek()[0] != "eof":
        raise p._err(f"trailing input after expression: {p.peek()[1]!r}")
    return e


def parse_type(text: str) -> T.DataType:
    p = _Parser(tokenize(text))
    t = p.parse_type()
    if p.peek()[0] != "eof":
        raise ZedSyntaxError("trailing input after type")
    return t
