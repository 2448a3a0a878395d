"""roar_spark — a PySpark-native analytics engine with the capabilities of
TFMV/roar (streaming ingestion gateway) plus the relational + LLM-data-pipeline
query surface the reference delegates to its clients.

Reference (read-only, studied for behavior only): /root/reference
See SURVEY.md for the full blueprint; citations in docstrings are
``path:line`` into the reference tree.

Layout:
    session.py    SparkSession builder tuned for columnar/AQE execution
    config.py     engine configuration mirroring the reference's CLI flags
    inference.py  JSON schema inference + type-promotion lattice (parity with
                  kafka/consumer.go:651-982)
    coerce.py     scalar coercion rules (kafka/consumer.go:698-825)
    catalog.py    table loading / temp-view registration for the test corpus
    sources/      ingestion sources (kafka, file-simulated kafka envelopes)
    streaming/    stream registry, bounded retention, TTL janitor, serving
    operators/    relational + LLM-pipeline operators (joins, aggs, windows,
                  dedup, similarity, text analysis, multimodal)
    functions/    reusable column-expression helpers (vector math, text)
"""

from roar_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
