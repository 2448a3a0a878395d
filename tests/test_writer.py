"""Sharded dataset writer: content-stable shard assignment, manifest
integrity, round-trip readability, shard-pruned reads."""

from __future__ import annotations

import hashlib
import json
import os

from roar_spark.operators.writer import write_sharded_dataset

SF = "/root/testdata/sf0.001"


def _expected_shard(doc_id: int, n_shards: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % n_shards


def test_write_sharded_dataset_round_trip(spark, tmp_path):
    out = str(tmp_path / "corpus_out")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    manifest = write_sharded_dataset(docs, out, key_col="doc_id", n_shards=8)

    # manifest written and consistent
    with open(os.path.join(out, "_manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest
    assert manifest["total_rows"] == docs.count()
    assert sum(manifest["rows_per_shard"].values()) == manifest["total_rows"]

    # round-trip: every row back, exactly once, in its content-stable shard
    back = spark.read.parquet(out)
    assert back.count() == manifest["total_rows"]
    rows = back.select("doc_id", "shard").collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        assert r.shard == _expected_shard(r.doc_id, 8)

    # shard layout on disk matches the manifest
    for s, n in manifest["rows_per_shard"].items():
        d = os.path.join(out, f"shard={s}")
        if n == 0:
            assert not os.path.isdir(d)
        else:
            assert os.path.isdir(d)

    # shard-pruned read: the filter must reach the scan as a partition
    # filter (directory pruning), not a post-scan row filter
    one = back.filter(back.shard == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "shard" in plan.split("PartitionFilters")[1][:80]
    assert one.count() == manifest["rows_per_shard"]["3"]


def test_write_sharded_dataset_is_reprocessing_stable(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = write_sharded_dataset(docs, str(tmp_path / "a"), n_shards=8)
    # a different partitioning of the same input → identical assignment
    b = write_sharded_dataset(docs.repartition(3), str(tmp_path / "b"), n_shards=8)
    assert a == b


def test_cli_materialize_sql(tmp_path):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "mat_out")
    r = subprocess.run(
        [sys.executable, "-m", "roar_spark.cli", "materialize",
         "--query", "SELECT doc_id, lang FROM documents WHERE lang = 'en'",
         "--out", out, "--shards", "4", "--dir", SF],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] > 0
    assert os.path.exists(os.path.join(out, "_manifest.json"))


def test_missing_shard_key_raises_cleanly(spark):
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("lang")
    with pytest.raises(ValueError, match="shard key column 'doc_id'"):
        write_sharded_dataset(docs, "/tmp/never_written")


def test_cli_materialize_from_store(spark, tmp_path, capsys):
    """materialize over a served-stream retention store: the store view is
    queryable and its result lands as a sharded dataset + manifest."""
    from roar_spark.cli import main

    store = tmp_path / "store" / "metrics_topic"
    store.mkdir(parents=True)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id long, v string"
    ).write.parquet(str(store / "batch0"))
    out = str(tmp_path / "mat_store")
    rc = main(
        [
            "materialize",
            "--query", "SELECT id, v FROM metrics_topic",
            "--out", out,
            "--key", "id",
            "--shards", "2",
            "--dir", SF,
            "--store-dir", str(tmp_path / "store"),
        ]
    )
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["total_rows"] == 3
    assert spark.read.parquet(out).count() == 3


def test_empty_result_writes_zero_manifest(spark, tmp_path):
    """r5 review: an empty result wrote no parquet files and the
    schema-inferring read-back crashed AFTER the successful write; with
    the explicit schema the manifest is all zeros instead."""
    df = spark.createDataFrame([], "doc_id long, v string")
    out = str(tmp_path / "empty_ds")
    manifest = write_sharded_dataset(df, out, key_col="doc_id", n_shards=4)
    assert manifest["total_rows"] == 0
    assert manifest["rows_per_shard"] == {str(s): 0 for s in range(4)}


def test_reserved_column_collision_raises(spark, tmp_path):
    """Input columns named shard/_skey would be silently replaced by the
    writer's computed values — refuse instead of losing user data."""
    import pytest

    df = spark.createDataFrame([(1, 0)], "doc_id long, shard int")
    with pytest.raises(ValueError, match="shard"):
        write_sharded_dataset(df, str(tmp_path / "x"), key_col="doc_id")
