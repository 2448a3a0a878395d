"""Batch dataset materialization: write a curated corpus as content-
stable sharded parquet + a manifest — the output side of a training-data
pipeline (the reference covers the streaming sink path in
`streaming/sink.py`; this is its batch twin for query results).

Design for 100 TB:
- shard = md5(key) mod n_shards is CONTENT-stable: a document lands in
  the same shard under reprocessing, incremental append, or a different
  cluster size — the property that makes shard-level dedup/resume
  possible (same rationale as sampling.dataset_split).
- one repartition() keyed by the shard id is the only shuffle. Spark
  hashes the shard value into n_shards partitions, so a task usually
  holds one shard but hash collisions can co-locate two or three (and
  leave some tasks empty) — partitionBy still splits the FILES exactly
  per shard; only write parallelism is approximate. Hash uniformity
  bounds skew; `max_records_per_file` caps file sizes so a hot shard
  splits into multiple files instead of one giant row group.
- the manifest write is a driver-side local file (posix path assumption,
  like the sink's rename commit); on object storage write the returned
  dict through your store's API (or a Delta/Iceberg table property).
- intra-shard order is the deterministic shuffle key (dataset_shuffle's
  ordering) applied via sortWithinPartitions — a per-task sort, NO
  global sort/range exchange.
- the manifest is driver-side but O(n_shards) (aggregated counts
  collected from a bounded groupBy), never O(rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_DEFAULT_SHARDS = 16


def spark_read_back(df: DataFrame, out_dir: str) -> DataFrame:
    """Read the just-written dataset with the session that wrote it.

    The schema is supplied explicitly (input columns + the shard
    partition column): an EMPTY result writes no parquet files, and a
    schema-inferring read would then fail with UNABLE_TO_INFER_SCHEMA
    after the (successful) write instead of returning an all-zero
    manifest (r5 review)."""
    from pyspark.sql import types as T

    written = T.StructType(
        list(df.schema.fields) + [T.StructField("shard", T.IntegerType(), True)]
    )
    return df.sparkSession.read.schema(written).parquet(out_dir)


def write_sharded_dataset(
    df: DataFrame,
    out_dir: str,
    key_col: str = "doc_id",
    n_shards: int = N_DEFAULT_SHARDS,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Write ``df`` to ``out_dir`` partitioned into content-stable shards,
    shuffled within each shard by the content key; returns the manifest
    (also written to ``out_dir/_manifest.json``).

    Layout: ``out_dir/shard=NN/part-*.parquet`` — readable back with
    ``spark.read.parquet(out_dir)`` (the shard column comes back via
    partition discovery, usable for shard-pruned reads)."""
    if key_col not in df.columns:
        raise ValueError(
            f"shard key column {key_col!r} not in result columns {df.columns}; "
            "pass key_col= (CLI: --key) naming one of them"
        )
    clobbered = {"shard", "_skey"} & set(df.columns)
    if clobbered:
        # withColumn would silently REPLACE these with computed values and
        # the user's data would vanish from the written dataset (r5 review)
        raise ValueError(
            f"result columns {sorted(clobbered)} collide with the writer's "
            "internal shard/_skey columns; rename them before materializing"
        )
    # NULL keys hash as the empty string → one deterministic shard (never a
    # NULL shard value, which would land rows in __HIVE_DEFAULT_PARTITION__
    # outside the manifest)
    key_md5 = F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("")))
    shard = (F.conv(F.substring(key_md5, 1, 4), 16, 10).cast("long") % n_shards).cast(
        "int"
    )
    sharded = df.withColumn("shard", shard).withColumn("_skey", key_md5)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_skey")
        .drop("_skey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # Count what was WRITTEN, not a re-execution of the input plan: a
    # non-deterministic source query would make a recomputed manifest
    # disagree with the files on disk (and even deterministic plans would
    # pay a second full execution). Reading the fresh parquet back is one
    # cheap footer-driven count per shard.
    counts = {
        int(r.shard): int(r.n)
        for r in (
            spark_read_back(df, out_dir)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "total_rows": sum(counts.values()),
        "rows_per_shard": {str(s): counts.get(s, 0) for s in range(n_shards)},
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
