"""Structured Streaming layer: sources, sinks, watermarked jobs, and
stateful (CEP-style) operators.

Batch/stream symmetry: the windowed/join/pattern operators in
``flink_kafka_spark.operators`` are plain DataFrame functions, so the
streaming jobs here compose the SAME operator code after attaching
``withWatermark`` — the Spark analog of the reference running one
dataflow over both `readTextFile` replays and Kafka topics.
"""
