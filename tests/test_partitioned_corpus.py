"""Real corpora are hive-partitioned multi-file directories, not the
driver's single-file-per-table layout. Pin that the catalog + operators
produce IDENTICAL results over a partitioned copy of the corpus, that
partition pruning reaches the scan, and that the footer-metadata layout
scan recurses into partition subdirectories."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from roar_spark.catalog import _scan_layout, load_table
from roar_spark.operators.dedup import dedup_exact, dedup_simhash
from roar_spark.operators.text import text_stats

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    """sf0.001 with documents rewritten as a lang-partitioned directory
    (and the other tables the ops need, copied single-file)."""
    d = tmp_path_factory.mktemp("part_corpus")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (
        docs.repartition(4)
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(str(d / "documents.parquet"))
    )
    return str(d)


def test_scan_layout_recurses_partition_dirs(spark, part_dir):
    groups, rows = _scan_layout(f"{part_dir}/documents.parquet")
    assert rows == 500  # sf0.001 corpus size — footers found under part dirs
    assert groups >= 1


def test_operators_identical_on_partitioned_corpus(spark, part_dir):
    # partition columns come back via discovery; row multisets must match
    base = sorted(map(tuple, dedup_exact(spark, SRC).collect()))
    part = sorted(map(tuple, dedup_exact(spark, part_dir).collect()))
    assert base == part

    base = sorted(map(tuple, text_stats(spark, SRC).collect()), key=repr)
    part = sorted(map(tuple, text_stats(spark, part_dir).collect()), key=repr)
    assert base == part

    # simhash's footer-based path dispatch must see the true row count
    base = sorted(map(tuple, dedup_simhash(spark, SRC).collect()))
    part = sorted(map(tuple, dedup_simhash(spark, part_dir).collect()))
    assert base == part


def test_partition_pruning_reaches_scan(spark, part_dir):
    df = load_table(spark, "documents", part_dir).filter("lang = 'en'")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "lang" in line  # directory pruning, not a post-scan row filter


def test_row_count_and_dim_helpers_recurse(spark, tmp_path_factory):
    from roar_spark.catalog import embedding_dim, table_row_count

    d = tmp_path_factory.mktemp("part_emb")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (
        emb.withColumn("part", (emb.vec_id % 3).cast("int"))
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(str(d / "embeddings.parquet"))
    )
    assert table_row_count("embeddings", str(d)) == emb.count()
    assert embedding_dim(str(d)) == len(emb.first().embedding)
