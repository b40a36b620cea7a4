"""Column-level function library (JVM-side expressions only — no Python
UDFs in any hot path)."""
