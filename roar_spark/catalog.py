"""Test-corpus catalog: load the driver-generated parquet tables.

The reference's "catalog" is a topic→stream map served over Flight
(stream/manager.go:33-54, flight/server.go:82-130); the relational corpus
here is the surface those streams get queried with. Tables are the
driver-provided TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` and ``embeddings`` (LLM-pipeline fixtures) — see TESTDATA.md.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at EVERY scale factor —
# region/nation are fixed-cardinality (5/25 rows) regardless of SF, exactly
# the shape broadcast-hash-join exists for.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


# Columns written as parquet TIMESTAMP(NANOS) — Spark has no ns timestamp,
# so they are read as raw nano longs (legacy conf) and normalized to µs
# TimestampType here (floor division; matches DuckDB's ns→µs cast). This is
# the same ns→µs precision mapping the reference's Arrow timestamp[ns]
# columns get (SURVEY.md §1.3).
_NANO_TS_COLUMNS = {"events": ("ts",)}


def _scan_layout(path: str) -> tuple[int, int]:
    """(row_groups, rows) from parquet footers — driver-side, no Spark job.
    Spark parallelizes a parquet scan by ROW GROUP: a 600k-row single-
    row-group file is one task no matter how many cores exist."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # recurse: real corpora are hive-partitioned (table/part=x/*.parquet)
        groups = rows = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    m = pq.ParquetFile(os.path.join(root, f)).metadata
                    groups += m.num_row_groups
                    rows += m.num_rows
        return groups, rows
    m = pq.ParquetFile(path).metadata
    return m.num_row_groups, m.num_rows


def load_table(
    spark: SparkSession,
    name: str,
    directory: str | None = None,
    spread: bool | int = False,
    spread_key: str | None = None,
) -> DataFrame:
    """Read one corpus table. Plain parquet scan → full Catalyst pushdown
    (predicate pushdown, column pruning, partition pruning all apply).

    ``spread=True`` (per-operator opt-in): when the footer metadata shows
    fewer row groups than the session's parallelism (and the table isn't
    broadcast-sized), a round-robin repartition follows the scan so
    downstream map stages use every core — otherwise a single-row-group
    file serializes the whole first stage through one task (measured 8 s
    single-task n-gram stages on a 32-core box). Filters and column
    pruning still reach the scan: Catalyst pushes predicates and prunes
    columns THROUGH Repartition, so the exchange carries only
    post-pushdown rows.

    It is an OPT-IN, not the default, because the extra exchange is pure
    overhead for queries whose first stage is cheap or immediately
    shuffles anyway — measured at sf0.1: q1 0.63→1.04 s, minhash
    1.64→4.22 s with a blanket spread, vs text_gopher_quality 8.5→3.9 s
    with it. Only operators whose first stage does heavy per-row work
    with no early shuffle (n-gram repetition scoring) request it. On a
    real corpus (thousands of row groups / files) the row-group condition
    is false and even the opt-in is a no-op — the scan itself provides
    the parallelism.

    An INT value is the same opt-in with a per-operator row floor: spread
    only when the footer shows at least that many rows. Operators whose
    per-row first-stage work is light (one fold/hash per row, e.g. the
    embeddings consumers) lose to the exchange at small sizes (measured:
    sim_brute_topk +0.34 s at the 2 k-row sf0.1 table) but gain hugely
    once the single-task stage dominates (80.8 s → 5.5 s at 1 M rows);
    the floor keeps both measurements. ``True`` keeps the 2 000-row
    default floor for heavy-per-row callers (gopher wins at 5 k rows).

    ``spread_key`` (r11, guide §2.4): spread with
    ``repartitionByRange(parallelism, key)`` instead of round-robin.
    For operators whose output is ``orderBy(key, ...)`` over a per-row
    projection, RangePartitioning(key) both spreads the heavy first
    stage AND satisfies the final OrderedDistribution (prefix rule), so
    the one payload exchange replaces TWO exchanges + a global sort
    (round-robin spread + final range). Costs one extra sampling pass
    over just the key column; only sensible when the key is roughly
    uniform (doc_id is)."""
    directory = directory or sf_dir()
    bucketed = _bucketed_tables.get((directory, name))
    if bucketed is not None:
        return spark.table(bucketed)
    if name in _NANO_TS_COLUMNS:
        # Set at runtime too: the driver's harness builds its own session,
        # which won't have gone through roar_spark.session.get_spark().
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 — conf removed/renamed: proceed
            pass
    path = f"{directory}/{name}.parquet"
    df = spark.read.parquet(path)
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer div — epoch-ns (~1.7e18) overflows double precision
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Files written with TIMESTAMP(isAdjustedToUTC=false) surface as
    # TIMESTAMP_NTZ; normalize to TimestampType so epoch arithmetic
    # (unix_micros & co.) works uniformly. The cast reinterprets wall-clock
    # in the SESSION timezone, so pin it to UTC first (runtime-settable) —
    # a driver-built session isn't guaranteed UTC, and under any other zone
    # the cast would shift the instant, diverging unix_micros/epoch
    # arithmetic from the DuckDB oracle's naive timestamps (ADVICE r2).
    # KNOWN TRADEOFF: this mutates GLOBAL session state — a host embedding
    # this catalog in a deliberately non-UTC session sees its own
    # timestamp→string rendering switch to UTC after the first NTZ load.
    # The engine's contract (oracle parity on epoch arithmetic) needs the
    # session pinned; hosts that must keep a display zone should set
    # spark.sql.session.timeZone back after loading, or render with
    # date_format(..., tz) explicitly.
    if any(dtype == "timestamp_ntz" for _, dtype in df.dtypes):
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:  # noqa: BLE001 — read-only conf: keep going
            pass
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
    # `is not False` not truthiness: spread=0 is a legitimate int floor
    # ("always spread") and must not silently disable spreading (ADVICE r5)
    if spread is not False and name not in BROADCAST_TABLES:
        parallelism = spark.sparkContext.defaultParallelism
        groups, rows = _scan_layout(path)
        min_rows = spread if isinstance(spread, int) and not isinstance(spread, bool) else 2000
        if groups < max(2, parallelism // 2) and rows >= min_rows:
            df = (
                df.repartitionByRange(parallelism, spread_key)
                if spread_key is not None
                else df.repartition(parallelism)
            )
    return df


# --- opt-in bucketed catalog mode -------------------------------------------
#
# The one unavoidable big shuffle in the corpus is orders⋈lineitem on
# orderkey. At 100 TB the write-time answer is bucketing both tables on the
# join key: co-located buckets let a sort-merge join plan WITHOUT an
# exchange on either side. The driver corpus is read-only parquet, so the
# mode materializes bucketed MANAGED copies once (an ETL step a real
# deployment does at ingest time) and routes load_table through them.
# Opt-in, not default: the one-time write only pays off for repeated
# key-joined analytics, and managed-table copies double storage.

_BUCKET_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
_bucketed_tables: dict[tuple[str, str], str] = {}  # (dir, name) -> table


def enable_bucketed_catalog(
    spark: SparkSession,
    directory: str | None = None,
    tables: tuple[str, ...] = ("orders", "lineitem"),
    n_buckets: int = 8,
) -> None:
    """Materialize bucketed managed copies of ``tables`` (bucketBy on their
    join key, sorted within buckets) and make load_table serve them for
    ``directory``. Idempotent per (directory, table). The copies go through
    load_table first, so the timestamp normalizations bake into the managed
    schema."""
    import hashlib
    import shutil
    from urllib.parse import urlparse

    directory = directory or sf_dir()
    for name in tables:
        key = _BUCKET_KEYS[name]
        tag = hashlib.md5(f"{directory}:{n_buckets}".encode()).hexdigest()[:8]
        tbl = f"roar_bucketed_{name}_{tag}"
        # idempotency is per REQUESTED table (the tag bakes n_buckets in):
        # a changed bucket count re-materializes and re-routes rather than
        # silently keeping the old copy
        if _bucketed_tables.get((directory, name)) != tbl:
            if not spark.catalog.tableExists(tbl):
                # the warehouse location can outlive the (in-memory) catalog
                # entry across sessions; a stale location makes the CREATE
                # refuse. It is OUR derived table path — clear it.
                wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
                shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
                load_table(spark, name, directory).write.bucketBy(
                    n_buckets, key
                ).sortBy(key).mode("overwrite").saveAsTable(tbl)
            _bucketed_tables[(directory, name)] = tbl


def disable_bucketed_catalog() -> None:
    """Route load_table back to the plain parquet scans (managed copies
    stay on disk for the next enable)."""
    _bucketed_tables.clear()


def register_views(spark: SparkSession, directory: str | None = None) -> dict[str, DataFrame]:
    """Register every corpus table as a temp view (idempotent).

    Views keep the plan declarative: Catalyst sees the parquet scan directly,
    so filters written against the view still push down to the file source.
    Views go through :func:`load_table` so the ns→µs timestamp normalization
    applies uniformly — a view of ``events`` exposes the same ``ts``
    TimestampType every operator sees, not a raw epoch-ns bigint.
    """
    directory = directory or sf_dir()
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = f"{directory}/{name}.parquet"
        if not os.path.exists(path):
            continue
        df = load_table(spark, name, directory)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def scan_underparallel(name: str, directory: str | None, parallelism: int) -> bool:
    """True when the table's parquet layout yields fewer scan tasks than
    half the session parallelism — the same footer condition load_table's
    ``spread`` opt-in uses, exposed for operators that spread with their
    own key/width (e.g. dedup_minhash_lsh's doc_id-clustered shingle
    build). On a real multi-file corpus this is False and the caller
    skips its repartition entirely — the scan itself provides the
    parallelism, and forcing a corpus-wide exchange there would shuffle
    full text for nothing (guide §2.4)."""
    directory = directory or sf_dir()
    groups, _rows = _scan_layout(f"{directory}/{name}.parquet")
    return groups < max(2, parallelism // 2)


def table_row_count(name: str, directory: str | None = None) -> int:
    """Exact row count from parquet footer metadata — a driver-side footer
    read, NO Spark job. Used where an operator dispatches on corpus size
    (e.g. dedup_simhash's pair-stage choice): a ``df.count()`` there costs
    a full scheduled job per invocation, while footers are O(#files) and
    already cached by the OS. At cluster scale this is the same information
    the engine's scan statistics carry."""
    directory = directory or sf_dir()
    # _scan_layout handles both single files and (hive-partitioned) dirs —
    # one copy of the footer-walk logic, not three (r5 review)
    return _scan_layout(f"{directory}/{name}.parquet")[1]


def embedding_dim(directory: str | None = None, name: str = "embeddings") -> int:
    """Embedding vector width, read from the first row of the first parquet
    row group (driver-side, no Spark job). List width is data not schema in
    parquet, so one tiny footer+page read is the cheapest honest source."""
    import pyarrow.parquet as pq

    directory = directory or sf_dir()
    path = f"{directory}/{name}.parquet"
    if os.path.isdir(path):
        # deterministic walk order — recurses for hive-partitioned
        # layouts (part=x/*.parquet)
        files = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    # scan until a NON-NULL embedding: Spark routinely writes empty
    # part-00000 files, a dir may hold only _SUCCESS, and the first row's
    # embedding can be NULL — each crashed the bare files[0]/next()/len()
    # chain instead of falling through (r8 review)
    for f in files:
        for batch in pq.ParquetFile(f).iter_batches(
            batch_size=64, columns=["embedding"]
        ):
            col = batch.column("embedding")
            for value in col:
                if value.is_valid:
                    return len(value)
    raise ValueError(
        f"{path}: no non-null 'embedding' value in any parquet file — "
        "cannot determine the vector width"
    )
