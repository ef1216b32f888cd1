"""PySpark-native analytics engine with the query surface of the
Stefan2114/map-reduce-framework reference (a Go MapReduce framework),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
    session       -- SparkSession factory (AQE on, sane shuffle conf)
    sources.io    -- parquet/text sources, reference-format text sink
    functions.*   -- reusable column expressions (tokenizers, hashing, vectors)
    operators.*   -- the query library (apps, relational, kv, dedup, ...)
    plans         -- physical-plan inspection helpers
    streaming     -- Structured Streaming jobs
    control       -- gossip health-table + job-manifest checkpoint (paper parity)
"""

__version__ = "0.1.0"
