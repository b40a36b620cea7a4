"""Zed `grok()` — structured text extraction with grok patterns.

Zed's function library includes ``grok(p, s [, definitions])``: expand a
grok pattern (``%{SYNTAX:SEMANTIC}`` references over a base dictionary)
into a regular expression and return a record of the named captures
(all strings), or error/null when the line doesn't match.  zync users
reach for it in shapers over raw syslog/access-log topics.

Spark-first design: the grok pattern is a *compile-time* literal, so we
expand it to a single Java-compatible regex on the driver and emit one
``regexp_extract`` per named capture plus one ``rlike`` guard — all
JVM-side, whole-stage-codegen friendly, zero Python in the executor
path.  The base dictionary below is the standard grok core subset
(logstash-patterns-core `grok-patterns`, public), rewritten capture-free
so that expansion order alone determines group numbering.

Reference parity: Zed func docs `grok.md`; the reference repo's shapers
may call any Zed function (zync delegates the shaper text verbatim —
cli/shaper.go).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["BASE_PATTERNS", "compile_grok", "grok"]

# Core grok dictionary (capture-free: every alternation is (?:...) so the
# only capturing groups in the expanded regex are the %{X:name} wrappers).
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"])*\"|'(?:\\.|[^\\'])*')",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    "IP": r"%{IPV4}",
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "MONTH": (
        r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
        r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
        r"Nov(?:ember)?|Dec(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|"
        r"[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
        r"[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
}

_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


class GrokError(ValueError):
    """Bad grok pattern: unknown reference or cyclic definition."""


def _expand(pattern: str, defs: dict[str, str], depth: int = 0) -> str:
    """Expand %{NAME} references (ignoring capture names) recursively."""
    if depth > 20:
        raise GrokError("grok pattern recursion too deep (cycle?)")

    def sub(m: re.Match) -> str:
        name = m.group(1)
        body = defs.get(name)
        if body is None:
            raise GrokError(f"unknown grok pattern %{{{name}}}")
        return "(?:" + _expand(body, defs, depth + 1) + ")"

    return _REF.sub(sub, pattern)


def compile_grok(
    pattern: str, definitions: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Expand a grok pattern into ``(regex, field_names)``.

    Named references ``%{SYNTAX:semantic}`` become capturing groups, in
    left-to-right order; unnamed references expand non-capturing.  The
    base dictionary is capture-free, so group ``i+1`` of the compiled
    regex is exactly ``field_names[i]`` — no name mangling needed (Java
    named groups reject the underscores grok semantics routinely use).
    """
    defs = dict(BASE_PATTERNS)
    if definitions:
        defs.update(definitions)
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        name, sem = m.group(1), m.group(2)
        body = defs.get(name)
        if body is None:
            raise GrokError(f"unknown grok pattern %{{{name}}}")
        expanded = _expand(body, defs)
        if sem is None:
            return "(?:" + expanded + ")"
        fields.append(sem)
        return "(" + expanded + ")"

    regex = _REF.sub(sub, pattern)
    try:
        compiled = re.compile(regex)
    except re.error as exc:  # pragma: no cover - authoring error
        raise GrokError(f"grok pattern expands to invalid regex: {exc}")
    if compiled.groups != len(fields):
        raise GrokError(
            "grok pattern contains raw capturing groups; use (?:...) "
            "in custom definitions"
        )
    return regex, fields


def grok(
    pattern: str,
    s: Column,
    definitions: dict[str, str] | None = None,
) -> Column:
    """``grok(p, s)`` as a struct column of string captures.

    Non-matching rows yield null (Zed returns an error value; on a
    union-less engine null is the documented mapping — same convention
    as the codec error paths).  One ``rlike`` guard + N
    ``regexp_extract`` — all JVM-side.
    """
    regex, fields = compile_grok(pattern, definitions)
    if not fields:
        raise GrokError("grok pattern captures no fields (no %{X:name})")
    struct = F.struct(
        *[
            F.regexp_extract(s, regex, i + 1).alias(name)
            for i, name in enumerate(fields)
        ]
    )
    # rlike is an unanchored search; grok's contract is "the pattern
    # describes (part of) the line" — same search semantics both sides.
    return F.when(s.rlike(regex), struct)
