"""zedgen: the Zed program generator (etl/build.go port).

Three layers of evidence:
  1. byte-exactness against the reference's own golden
     (ztests/etl-zed.yaml, produced by `zync etl -zed invoices.yaml`);
  2. the emitted text parses and compiles through zedql;
  3. differential equivalence with the native planner: over the
     4-batch invoices replay, the generated program's fresh-row count
     matches the native pipeline's "ETL'd n" before each run and drops
     to zero after (the anti-join incremental contract)."""

from __future__ import annotations

import os

import pytest
import yaml

from zinger_spark.etl import zedgen
from zinger_spark.etl.config import transform_from_dict
from zinger_spark.etl.planner import EtlPipeline
from zinger_spark.sources.pool import Pool
from zinger_spark.zedql import compile_query, parse

from tests.test_etl_demo import (
    AFTER_INV,
    AFTER_IS,
    BATCHES,
    ETLD,
    VERBATIM_YAML,
    envelope_schema,
    make_transform_zed,
)

REF_YAML = "/root/reference/ztests/etl-zed.yaml"


def _transform():
    return transform_from_dict(yaml.safe_load(VERBATIM_YAML))


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference not mounted")
def test_emit_matches_reference_golden():
    got = "\n===\n".join(zedgen.build(_transform())) + "\n"
    want = yaml.safe_load(open(REF_YAML))["outputs"][0]["data"]
    assert got == want


def test_emitted_program_parses():
    (prog,) = zedgen.build(_transform())
    p = parse(prog)
    assert [d.name for d in p.decls] == ["done"]
    assert len(p.seq.ops) >= 3


def test_emit_zed_cli(tmp_path, capsys):
    from zinger_spark.cli import main

    cfg = tmp_path / "invoices.yaml"
    cfg.write_text(VERBATIM_YAML)
    assert main(["etl", str(cfg), "--emit-zed"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("type done = ")
    assert "| sort kafka.offset" in out


def test_differential_generated_vs_native(spark, tmp_path):
    """Generator + compiler vs the native planner, across all 4 demo
    batches: before each native run the compiled generated program
    sees exactly the rows the native pipeline is about to ETL
    (pipeline.go:72 counts the whole query result); after the run and
    its done-marker commit, it sees none."""
    pools = {
        "Raw": Pool.create(spark, str(tmp_path / "Raw")),
        "Staging": Pool.create(spark, str(tmp_path / "Staging")),
    }
    transform = make_transform_zed()
    (prog,) = zedgen.build(transform)
    pipeline = EtlPipeline(spark, transform, lambda name: pools[name])

    def zed_count() -> int:
        def pool_df(name):
            p = pools[name]
            return None if p.is_empty() else p.df()

        staging = pool_df("Staging")
        if staging is None:
            # empty pool: same schema as Raw, no rows
            raw = pool_df("Raw")
            staging = spark.createDataFrame([], raw.schema)
        return compile_query(
            spark, prog, tables={"Raw": pool_df("Raw"), "Staging": staging}
        ).count()

    for i, (invoices, statuses) in enumerate(BATCHES):
        if invoices:
            pools["Raw"].load_batch(
                spark.createDataFrame(invoices, envelope_schema(AFTER_INV))
            )
        if statuses:
            pools["Raw"].load_batch(
                spark.createDataFrame(statuses, envelope_schema(AFTER_IS))
            )
        assert zed_count() == ETLD[i], f"batch {i + 1} fresh rows"
        assert pipeline.run() == ETLD[i]
        assert zed_count() == 0, f"batch {i + 1} not drained"
