"""Structured-Streaming jobs: the from-kafka / to-kafka sync loops."""
