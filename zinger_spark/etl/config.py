"""Transform YAML config + route planning/validation.

Schema and constraints replicate etl/yaml.go:9-29 and etl/routes.go of
the reference: every topic maps to exactly one pool, and every output
of a given input topic must land in the same pool (so one cursor query
per pool answers the anti-join, etl/build.go:9-18).

The ``zed`` block of each rule is a *Spark SQL expression* producing
the ``out`` struct (the reference's shaper contract, README.md:303-315:
stateless rules see ``in``, denorm rules see ``left``/``right``).  A
``typeof(<path>)`` pseudo-function is resolved at plan time against the
input schema (demo/invoices.yaml's typed-null tombstone:
``cast(null, typeof(in.value.before))``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml


class ConfigError(Exception):
    pass


@dataclass
class Route:
    topic: str
    pool: str


@dataclass
class Rule:
    type: str  # 'stateless' | 'denorm'
    out: str
    zed: str
    where: str = ""
    in_topic: str = ""
    left: str = ""
    right: str = ""
    join_on: str = ""  # "left.<path>=right.<path>"
    # skew knob for denorm joins: shard the LEFT side's rows over this
    # many salt values and replicate the right side per shard
    # (operators/skew.salted_join) — for CDC keys hot enough that AQE's
    # post-hoc skew split doesn't kick in (e.g. the skew only
    # materializes after the anti-join prelude filters, which AQE's
    # size statistics don't see).  0 = off (plain equi-join + AQE).
    salt: int = 0


@dataclass
class Transform:
    """``output`` is the reference's single output route (etl/yaml.go:12);
    ``outputs`` is this engine's lift of the reference's one-output-topic
    limitation (etl/pipeline.go:66-68 panics on more) — a transform may
    declare N output routes and its rules may fan the SAME incremental
    input window out to any of them.  Passing only ``output`` keeps the
    reference-compatible single-output form; ``outputs`` supersedes it."""

    inputs: list[Route]
    output: Route | None
    etls: list[Rule]
    outputs: list[Route] = field(default_factory=list)
    routes: "Routes" = field(init=False)

    def __post_init__(self):
        if not self.outputs:
            if self.output is None:
                raise ConfigError("transform needs at least one output route")
            self.outputs = [self.output]
        seen = set()
        for r in self.outputs:
            if r.topic in seen:
                raise ConfigError(f"duplicate output route for topic {r.topic!r}")
            seen.add(r.topic)
        if self.output is None:
            self.output = self.outputs[0]
        self.routes = _plan_routes(self)


class Routes:
    """topic->pool map + input/output topic graph (etl/routes.go:7-28)."""

    def __init__(self, pools: dict[str, str]):
        self.pools = pools
        self.inputs: dict[str, list[str]] = {}   # input -> output topics
        self.outputs: dict[str, list[str]] = {}  # output -> input topics

    def lookup_pool(self, topic: str) -> str:
        return self.pools[topic]

    def output_topics(self) -> list[str]:
        return list(self.outputs)

    def inputs_of(self, output: str) -> list[str]:
        return self.outputs.get(output, [])

    def enter(self, input_topic: str, output_topic: str) -> None:
        """etl/routes.go:53-73, incl. the same-pool constraint."""
        for t in (input_topic, output_topic):
            if t not in self.pools:
                raise ConfigError(f"topic {t!r} has unknown pool")
        outs = self.outputs.setdefault(output_topic, [])
        if input_topic not in outs:
            outs.append(input_topic)
        ins = self.inputs.setdefault(input_topic, [])
        if output_topic not in ins:
            if ins and self.pools[ins[0]] != self.pools[output_topic]:
                raise ConfigError(
                    f"input topic {input_topic!r} routed to multiple pools "
                    f"({self.pools[ins[0]]!r} and {self.pools[output_topic]!r})"
                )
            ins.append(output_topic)


def _plan_routes(t: Transform) -> Routes:
    pools: dict[str, str] = {}
    for route in [*t.inputs, *t.outputs]:
        if route.topic in pools and pools[route.topic] != route.pool:
            raise ConfigError(
                f"route for topic {route.topic!r} points to multiple pools"
            )
        pools[route.topic] = route.pool
    routes = Routes(pools)
    for etl in t.etls:
        if etl.type == "denorm":
            if not etl.left or not etl.right:
                raise ConfigError(
                    "both 'left' and 'right' topics must be specified for denorm ETL"
                )
            if etl.in_topic:
                raise ConfigError("'in' topic cannot be specified for denorm ETL")
            routes.enter(etl.left, etl.out)
            routes.enter(etl.right, etl.out)
        elif etl.type == "stateless":
            if etl.salt:
                raise ConfigError("'salt' applies to denorm ETL joins only")
            if not etl.in_topic:
                raise ConfigError("'in' topic must be specified for stateless ETL")
            if etl.left or etl.right:
                raise ConfigError(
                    "'left' or 'right' topic cannot be specified for stateless ETL"
                )
            routes.enter(etl.in_topic, etl.out)
        else:
            raise ConfigError(f"unknown ETL type: {etl.type!r}")
    return routes


def load_transform(path: str) -> Transform:
    """Load a transform YAML (etl/yaml.go:31-45)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return transform_from_dict(raw)


def transform_from_dict(raw: dict) -> Transform:
    inputs = [Route(d["topic"], d["pool"]) for d in raw.get("inputs", [])]
    # reference form: `output:` (one route, etl/yaml.go:12); extension:
    # `outputs:` (a list) or `output:` given as a list — multi-output
    out_raw = raw.get("outputs", raw.get("output"))
    if out_raw is None:
        raise ConfigError("transform needs an 'output' or 'outputs' block")
    if isinstance(out_raw, dict):
        out_raw = [out_raw]
    outputs = [Route(d["topic"], d["pool"]) for d in out_raw]
    etls = [
        Rule(
            type=d.get("type", ""),
            out=d.get("out", ""),
            zed=d.get("zed", ""),
            where=d.get("where", ""),
            in_topic=d.get("in", ""),
            left=d.get("left", ""),
            right=d.get("right", ""),
            join_on=d.get("join-on", ""),
            salt=int(d.get("salt", 0)),
        )
        for d in raw.get("transforms", [])
    ]
    return Transform(inputs=inputs, output=None, etls=etls, outputs=outputs)
