"""File-format scan coverage (SURVEY §2 Part B row 1): the engine reads
CSV and JSON files through the same built-in scan machinery as parquet —
pinned by round-tripping a corpus table through each format and requiring
exact row-multiset equality with the parquet original.

Schema handling mirrors production use: explicit schema (the
streaming-source pattern — no sampling job), plus a header'd CSV
inferSchema variant to exercise Spark's own inference path.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _multiset(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_json_lines_round_trip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "docs_json")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    assert _multiset(back) == _multiset(docs)


def test_csv_round_trip_explicit_schema(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "docs_csv")
    # text contains commas/quotes → escape+quote round-trip is the point
    docs.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(docs.schema).option("header", True).csv(out)
    assert _multiset(back) == _multiset(docs)


def test_csv_infer_schema_types(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "docs_csv2")
    docs.write.mode("overwrite").option("header", True).csv(out)
    inferred = (
        spark.read.option("header", True).option("inferSchema", True).csv(out)
    )
    assert dict(inferred.dtypes)["doc_id"] in ("int", "bigint")
    assert dict(inferred.dtypes)["text"] == "string"
    assert inferred.count() == docs.count()


def test_orc_round_trip(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema  # ORC carries types natively
    assert _multiset(back) == _multiset(docs)


def test_orc_predicate_pushdown(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / "docs_orc2")
    docs.write.mode("overwrite").orc(out)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        spark.read.orc(out).filter("doc_id < 10").select("doc_id").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan
