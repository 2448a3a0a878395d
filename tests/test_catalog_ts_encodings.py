"""The driver REGENERATES the corpus between rounds and the parquet
encoding of events.ts has already changed once (r1/r2: TIMESTAMP(NANOS),
r3: plain timestamp[us]/NTZ). load_table must normalize BOTH encodings to
the same µs TimestampType instants, so a future regeneration can't
silently shift epoch arithmetic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from roar_spark.catalog import load_table

ROWS = 5
# epoch µs values with sub-ms precision, away from any tz boundary
US = [1_755_000_000_123_456 + i * 7_919_003 for i in range(ROWS)]


def _write(dir_path, arrow_type, values):
    tbl = pa.table(
        {
            "event_id": pa.array(range(ROWS), pa.int64()),
            "ts": pa.array(values, arrow_type),
            "user_id": pa.array([1] * ROWS, pa.int64()),
            "event_type": pa.array(["view"] * ROWS),
            "value": pa.array([1.0] * ROWS),
            "props": pa.array(["{}"] * ROWS),
        }
    )
    pq.write_table(tbl, f"{dir_path}/events.parquet")
    return str(dir_path)


def test_nanos_and_micros_encodings_agree(spark, tmp_path):
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    _write(d_us, pa.timestamp("us"), US)
    _write(d_ns, pa.timestamp("ns"), [u * 1000 for u in US])

    from pyspark.sql import functions as F

    got = {}
    for name, d in (("us", d_us), ("ns", d_ns)):
        df = load_table(spark, "events", str(d))
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got[name] = [
            r.mu for r in df.select(F.unix_micros("ts").alias("mu")).orderBy("mu").collect()
        ]
    assert got["us"] == US
    assert got["ns"] == US


def test_embedding_dim_skips_empty_parts_and_null_rows(tmp_path):
    """r8 review: an empty first part file (Spark writes them routinely), a
    dir with no parquet at all, or a NULL first embedding each crashed
    embedding_dim; it must scan to the first non-null value and raise a
    clear error when none exists."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from roar_spark.catalog import embedding_dim

    d = tmp_path / "embeddings.parquet"
    os.makedirs(d)
    schema = pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))])
    # part-00000: zero rows; part-00001: NULL first row, real second row
    pq.write_table(schema.empty_table(), str(d / "part-00000.parquet"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array([None, [1.0, 2.0, 3.0]], pa.list_(pa.float32())),
            }
        ),
        str(d / "part-00001.parquet"),
    )
    assert embedding_dim(str(tmp_path)) == 3

    # all-null / no-files dirs fail loudly, not with IndexError/StopIteration
    empty = tmp_path / "e2" / "embeddings.parquet"
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no non-null"):
        embedding_dim(str(tmp_path / "e2"))
