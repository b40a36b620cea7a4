"""Connection configuration: ~/.zync-style kafka.json / schema_registry.json.

Parity with cli/flags.go of the reference: credentials live in
``$ZYNC_CONFIG_DIR`` (default ``~/.zync``) as ``kafka.json``
(bootstrap_servers, security_protocol, sasl_*; kafka.json template at
the repo root of the reference) and ``schema_registry.json``
(url/user/password; flags.go:37-63).  The Kafka dict converts to the
``kafka.*`` options of Spark's Kafka source/sink.
"""

from __future__ import annotations

import json
import os


class ConfigMissing(Exception):
    pass


def _config_dir() -> str:
    return os.environ.get(
        "ZYNC_CONFIG_DIR", os.path.join(os.path.expanduser("~"), ".zync")
    )


def _load(name: str) -> dict:
    path = os.path.join(_config_dir(), name)
    if not os.path.exists(path):
        raise ConfigMissing(f"{path} not found (see reference {name} template)")
    with open(path) as f:
        return json.load(f)


def kafka_config() -> dict:
    return _load("kafka.json")


def schema_registry_config() -> dict:
    return _load("schema_registry.json")


def wire_security(cfg: dict | None = None) -> dict:
    """kafka.json -> KafkaWireClient security kwargs, mirroring the
    reference's franz-go option mapping (cli/flags.go:86-113): the same
    four security_protocol values, the same "unknown value" errors, and
    SASL only under a SASL_* protocol.

    Extra key honored for self-signed deployments/tests: ``ssl_cafile``
    (a PEM path loaded into the context; franz-go would take the system
    roots, which a test stub's throwaway cert is never in).
    """
    cfg = cfg if cfg is not None else kafka_config()
    out: dict = {}
    proto = cfg.get("security_protocol", "") or ""
    if proto in ("", "PLAINTEXT", "SASL_PLAINTEXT"):
        pass
    elif proto in ("SSL", "SASL_SSL"):
        import ssl  # noqa: PLC0415

        ctx = ssl.create_default_context(cafile=cfg.get("ssl_cafile"))
        out["ssl_context"] = ctx
    else:
        raise ValueError(f"unknown security_protocol value {proto!r}")
    if proto.startswith("SASL_"):
        mech = cfg.get("sasl_mechanisms", "") or ""
        if mech != "PLAIN":
            raise ValueError(f"unknown sasl_mechanisms value {mech!r}")
        out["sasl_plain"] = (
            cfg.get("sasl_username", ""),
            cfg.get("sasl_password", ""),
        )
    return out


def kafka_spark_options(cfg: dict | None = None) -> dict[str, str]:
    """kafka.json -> Spark Kafka source/sink options (the franz-go opts
    built in cli/flags.go:66-99 mapped to their Spark names)."""
    cfg = cfg or kafka_config()
    opts = {"kafka.bootstrap.servers": cfg["bootstrap_servers"]}
    proto = cfg.get("security_protocol")
    if proto:
        opts["kafka.security.protocol"] = proto
    if cfg.get("sasl_mechanisms"):
        opts["kafka.sasl.mechanism"] = cfg["sasl_mechanisms"]
        user = cfg.get("sasl_username", "")
        pw = cfg.get("sasl_password", "")
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="{user}" password="{pw}";'
        )
    return opts
