"""The zync ETL subsystem: YAML transform config -> DataFrame pipeline.

Mirrors /root/reference/etl (yaml.go, routes.go, build.go, pipeline.go)
with the Zed-text codegen replaced by DataFrame logical-plan
construction."""

from .config import Rule, Transform, load_transform
from .planner import EtlPipeline, explain

__all__ = ["Rule", "Transform", "load_transform", "EtlPipeline", "explain"]
