"""Generate the Zed program text for a transform — the Build() step of
the reference (etl/build.go:20-109), reproduced byte-for-byte.

The reference's architecture is generate-then-delegate: Build()
assembles a Zed program per output topic and hands it to the Zed lake.
Our engine normally plans the same semantics natively
(etl/planner.EtlPipeline), but emitting the identical text closes the
loop twice over: `cli etl --emit-zed` matches the `zync etl -zed`
golden (ztests/etl-zed.yaml) exactly, and the emitted program runs
through zedql.compile_query — so generator and compiler can be
differentially tested against the native planner.

Formatting helpers mirror etl/build.go:142-160 (indent/formatZed/
formatZedHead) because the golden fixes every byte of the output.
"""

from __future__ import annotations

from .config import ConfigError, Rule, Transform

FROM_TEMPLATE = """
from (
  pool %s => kafka.topic==%s
  pool %s => is(<done>) kafka.topic==%s
) | anti join on kafka.offset=kafka.offset
"""


def _q(s: str) -> str:
    """Go %q for the plain names that appear in configs."""
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _indent(s: str, tab: int) -> str:
    bump = " " * tab
    out = ("\n" + bump).join(s.split("\n"))
    return bump + out.strip() + "\n"


def _format_zed_head(s: str, tab: int) -> str:
    s = s.strip()
    if s and s[0] == "|":
        s = s[1:]
    return "  " + _indent(s, tab)


def _format_zed(s: str, tab: int) -> str:
    s = s.strip()
    if s and s[0] != "|":
        s = "| " + s
    return _indent(s, tab)


def _build_from(input_topics: list[str], output_topic: str, routes) -> str:
    if not input_topics:
        raise ConfigError("no input topics found")
    if len(input_topics) == 1:
        in_topic = input_topics[0]
        in_pool = routes.lookup_pool(in_topic)
        out_pool = routes.lookup_pool(output_topic)
        return FROM_TEMPLATE % (_q(in_pool), _q(in_topic), _q(out_pool), _q(in_topic))
    code = ""
    for topic in input_topics:
        s = _build_from([topic], output_topic, routes)
        code += "=> " + s.lstrip("\n") + "\n"
    return "fork (\n%s)\n" % _indent(code, 2)


def _build_stateless(etl: Rule) -> str:
    where = f"({etl.where}) and " if etl.where else ""
    code = f"  case {where}kafka.topic=={_q(etl.in_topic)} =>\n"
    code += "    fork (\n"
    code += "      =>\n"
    code += "        yield {in:this}\n"
    code += "\n    // === user-defined ETL ===\n"
    code += _format_zed(etl.zed, 8)
    code += "\n"
    code += "        | out.kafka:=in.kafka\n"
    code += "        | yield out\n"
    code += f"        | kafka.topic:={_q(etl.out)}\n"
    code += "        \n"
    code += "      =>\n"
    code += "        yield cast({kafka:{topic:kafka.topic,offset:kafka.offset}},done)\n"
    code += "        \n"
    code += "      )\n"
    return code


def _build_denorm(etl: Rule) -> str:
    keys = etl.join_on.split("=")
    if len(keys) != 2:
        if not etl.join_on:
            raise ConfigError("no join-on expression provided in denorm rule")
        raise ConfigError(f"join-on syntax error: {etl.join_on!r}")
    left_key, right_key = keys[0].strip(), keys[1].strip()
    code = f"  case {etl.where} =>\n"
    code += "    fork (\n"
    code += f"      => kafka.topic=={_q(etl.left)} | yield {{left:this}} | sort {left_key}\n"
    code += f"      => kafka.topic=={_q(etl.right)} | yield {{right:this}} | sort {right_key}\n"
    code += "    )\n"
    code += f"    | join on {left_key}={right_key} right:=right\n"
    code += "    | fork (\n"
    code += "      =>\n"
    code += "          // === user-defined ETL ===\n"
    code += _format_zed_head(etl.zed, 8)
    code += "        | out.kafka:=left.kafka\n"
    code += "        | yield out\n"
    code += f"        | kafka.topic:={_q(etl.out)}\n"
    code += "      =>  yield {\n"
    code += "             left:cast({kafka:{topic:left.kafka.topic,offset:left.kafka.offset}},done),\n"
    code += "             right:cast({kafka:{topic:right.kafka.topic,offset:right.kafka.offset}},done)\n"
    code += "          }\n"
    code += "    )\n"
    return code


def _build_zed(input_topics: list[str], output_topic: str, routes, etls: list[Rule]) -> str:
    code = _build_from(input_topics, output_topic, routes)
    code = "type done = {kafka:{topic:string,offset:int64}}\n" + code
    code += "| yield this\n"  # switch can't handle multiple parents
    code += "| switch (\n"
    for etl in etls:
        if etl.type == "stateless":
            code += _build_stateless(etl)
        elif etl.type == "denorm":
            code += _build_denorm(etl)
        else:
            raise ConfigError(f"unknown ETL type: {etl.type!r}")
    code += ")\n| sort kafka.offset\n"
    return code


def build(transform: Transform) -> list[str]:
    """One Zed program per output topic (etl/build.go:20-85; route
    validation already happened in Transform.__post_init__)."""
    routes = transform.routes
    zeds = []
    for output_topic in routes.output_topics():
        etls = [e for e in transform.etls if e.out == output_topic]
        input_topics = routes.inputs_of(output_topic)
        zeds.append(_build_zed(input_topics, output_topic, routes, etls))
    return zeds
