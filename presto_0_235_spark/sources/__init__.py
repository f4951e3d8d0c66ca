"""File-format codecs with no vanilla-Spark DataFrame source/sink.

Currently: Apache Avro object-container files (pure-Python codec,
public Avro 1.11 specification) — see sources/avro.py.
"""
