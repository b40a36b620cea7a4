"""zinger_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of brimdata/zinger ("zync").

The reference (at /root/reference, ~3.6k LoC of Go) is a bidirectional
Kafka <-> Zed-lake sync connector with Debezium-CDC-aware ETL.  It
generates Zed queries and delegates execution to a Zed lake; this
package re-expresses both the dataflow operators (sources, sinks,
codecs, offset bookkeeping) and the generated query surface (filters,
anti-join dedup, denorm joins, grouped max, switch routing, fuse, ...)
as idiomatic PySpark DataFrame plans executed by Catalyst.

Layout:
  session      SparkSession builder tuned for the target scale
  datamodel    Kafka envelope schema, marker records, fuse merge
  sources/     pool (ordered lake table), kafka stream builders
  codecs/      Kafka Connect JSON, Confluent Avro wire format
  operators/   relational ops (anti-join, switch, top-1, offsets),
               dedup, similarity search, text analysis
  functions/   column-level helpers (text, vector math)
  etl/         YAML config -> DataFrame pipeline planner (zync etl)
  streaming/   from-kafka / to-kafka structured-streaming jobs
  plans/       plan explain/golden helpers
"""

__version__ = "0.1.0"
