"""Codecs: Kafka Connect JSON and Confluent Avro wire format."""
