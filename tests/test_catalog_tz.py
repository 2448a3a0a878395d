"""The NTZ→TimestampType normalization in catalog.load_table must be
timezone-proof: the driver builds its OWN SparkSession, which is not
guaranteed UTC, and under any other session zone a bare NTZ cast shifts
the instant — epoch arithmetic then diverges from the DuckDB oracle's
naive timestamps (ADVICE r2, catalog.py)."""

from __future__ import annotations

import duckdb
import pytest

from roar_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def non_utc_session(spark):
    before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", before)


def test_ntz_cast_epoch_matches_oracle_under_non_utc_session(non_utc_session):
    from pyspark.sql import functions as F

    spark = non_utc_session
    df = load_table(spark, "events", SF_DIR)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.select(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).collect()[0]
    want = duckdb.sql(
        f"SELECT min(epoch_us(CAST(ts AS TIMESTAMP))), max(epoch_us(CAST(ts AS TIMESTAMP))) "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()
    assert (got["lo"], got["hi"]) == want
