"""Scalar/column function library: text analysis, similarity search, and
near-duplicate sketches — the LLM-training-data operators layered on top
of the reference's surface (BASELINE.json north_star).

Design rule: everything here is built from JVM-side built-in functions
(`pyspark.sql.functions`) — no Python UDFs in any hot path — and all
hashing is `md5`-based so results are engine-portable (the DuckDB oracle
reproduces them bit-for-bit).
"""
