"""Sources & sinks: the pool (ordered lake table) and Kafka stream
builders."""
