"""Local mimic of the driver's correctness gate.

Runs every query in roar_spark.registry against its DuckDB oracle at a given
SF dir and compares: row count, sorted column names, and the order-insensitive
multiset of rows with EXACT value equality (the strictest plausible hash), so
passing here implies passing any reasonable driver hashing scheme. Reports
near-miss diagnostics (max float delta) when exact equality fails.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from roar_spark.catalog import TABLES  # noqa: E402
from roar_spark.registry import ORACLES, QUERIES  # noqa: E402

# The ONLY queries allowed to run without an oracle. Any other oracle-less
# query is a bug. Each entry carries the reason rows-only is its CEILING —
# what, specifically, cannot be value-hashed — plus the compensating
# evidence that bounds it anyway.
ROWS_ONLY_BY_DESIGN: dict[str, str] = {
    "agg_stats_sketches": (
        "sketch values are engine-internal: HLL++ register layout and the "
        "KLL/GK percentile sketch differ between Spark and DuckDB, so the "
        "estimates cannot match an oracle bit-for-bit, and stddev/corr at "
        "full double precision depend on accumulation order. Bounded "
        "instead IN-ROW: the query emits exact_parts/exact_median next to "
        "each estimate and within-tolerance flags the engine computes "
        "itself (tests pin the flags all-true); the exact-integer twin "
        "agg_stats_exact carries the value-hash oracle for the "
        "statistical half."
    ),
    "multimodal_decode_stub": (
        "the decode is ENV-CONDITIONAL: a real PIL decode when Pillow is "
        "importable on the worker, a deterministic digest stub otherwise "
        "(this container ships no codec libs, so the stub runs here) — "
        "either way no SQL engine can mirror a codec, so there is no "
        "value-hash oracle; the Spark-side plumbing (schema, batching, "
        "partitioning) and both kernels' dispatch are pinned by "
        "tests/test_multimodal.py."
    ),
}
from roar_spark.session import get_spark  # noqa: E402


def norm(v: object) -> object:
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_key(rows: list[tuple]) -> list[tuple]:
    return sorted((tuple(norm(v) for v in r) for r in rows), key=repr)


# canonical type names for the cross-engine schema comparison — grouped the
# way a driver plausibly normalizes them (ints by width, floats by width)
_SPARK_TYPE_CANON = {
    "tinyint": "int8", "smallint": "int16", "int": "int32", "bigint": "int64",
    "float": "float32", "double": "float64", "string": "string",
    "boolean": "bool", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date", "binary": "binary",
}
_DUCK_TYPE_CANON = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32", "BIGINT": "int64",
    "HUGEINT": "int128", "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "string", "BOOLEAN": "bool", "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp", "DATE": "date", "BLOB": "binary",
    "UBIGINT": "uint64",
}


def canon_spark(dtype: str) -> str:
    if dtype.startswith("array<") and dtype.endswith(">"):
        return f"array<{canon_spark(dtype[6:-1])}>"
    return _SPARK_TYPE_CANON.get(dtype, dtype)


def canon_duck(dtype: str) -> str:
    if dtype.endswith("[]"):  # DuckDB list type → Spark array form
        return f"array<{canon_duck(dtype[:-2])}>"
    return _DUCK_TYPE_CANON.get(dtype, dtype)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # the DRIVER's conditions: a bare session with default confs
        # (ANSI/defaults per Spark 4, 200 shuffle partitions, 10 MB
        # broadcast threshold, no nanosAsLong/timezone presets — queries
        # must set what they need at runtime, as load_table does)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "roar_check_vanilla"
        ).getOrCreate()
    else:
        spark = get_spark(app_name="roar_spark_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if only:
        unknown = [q for q in only if q not in QUERIES]
        if unknown:
            print(f"FAIL unknown query name(s): {unknown} — check spelling")
            sys.exit(2)

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_types = {c.lower(): canon_spark(t) for c, t in sdf.dtypes}
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            if name in ROWS_ONLY_BY_DESIGN:
                print(f"ok   {name}: rows-only ({len(s_rows)} rows, no oracle)")
                n_pass += 1
            else:
                # a query that SHOULD carry an oracle but doesn't (key typo
                # at registration, dropped entry) must FAIL, not silently
                # degrade to the weaker rows-only check
                print(f"FAIL {name}: oracle missing and not in ROWS_ONLY_BY_DESIGN")
                n_fail += 1
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = [c.lower() for c in rel.columns]
            d_types = {
                c.lower(): canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)
            }
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={s_cols} duckdb={d_cols}")
        else:
            type_diff = {
                c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]
            }
            if type_diff:
                problems.append(f"types differ: {type_diff}")
        if not problems:
            # align duckdb column order to spark's
            idx = [d_cols.index(c) for c in s_cols]
            d_rows = [tuple(r[i] for i in idx) for r in d_rows]
            sk, dk = rows_key(s_rows), rows_key(d_rows)
            if sk != dk:
                mism = sum(1 for a, b in zip(sk, dk) if a != b)
                delta = 0.0
                for a, b in zip(sk, dk):
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            delta = max(delta, abs(x - y))
                problems.append(f"values: {mism}/{len(sk)} sorted rows differ, max_float_delta={delta:.3e}")
                for a, b in zip(sk, dk):
                    if a != b:
                        print(f"  spark : {a}\n  duckdb: {b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
