"""Persistence sink: the corrected form of the reference's DuckDB sink.

The reference polls every 5 s and re-inserts EVERY buffered batch with no
high-water mark (duckdb/sink.go:89-125) → duplicate rows; and its DuckDB
driver is never actually linked (§2.3.1-2). We keep the *contract* —
one relational table per topic, schema derived from the stream schema
(duckdb/sink.go:128-156) — with exactly-once-per-micro-batch semantics via
checkpointed ``foreachBatch`` (deliberate, documented upgrade).

The testable part of the reference sink is its type mapping
(arrowToDuckDBType, duckdb/sink.go:212-250); ``spark_type_to_sql`` ports
that table (SURVEY.md §1.3) and ``create_table_ddl`` ports the DDL
generator (schemaToCreateTable, duckdb/sink.go:184-209).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "spark_type_to_sql",
    "create_table_ddl",
    "start_parquet_sink",
    "start_duckdb_sink",
]

# arrowToDuckDBType parity (duckdb/sink.go:212-250), keyed by Spark type.
# Unsigned arrow types cannot arise from Spark; date/timestamp keep the
# reference's DATE/TIMESTAMP, everything unknown falls back to VARCHAR.
_TYPE_MAP: list[tuple[type, str]] = [
    (T.ByteType, "TINYINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "FLOAT"),
    (T.DoubleType, "DOUBLE"),
    (T.BooleanType, "BOOLEAN"),
    (T.StringType, "VARCHAR"),
    (T.BinaryType, "BLOB"),
    (T.TimestampType, "TIMESTAMP"),
    (T.DateType, "DATE"),
]


def spark_type_to_sql(dtype: T.DataType) -> str:
    for py_type, sql in _TYPE_MAP:
        if isinstance(dtype, py_type):
            return sql
    return "VARCHAR"  # fallback (duckdb/sink.go:246-248)


def _quote_ident(name: str) -> str:
    """SQL-quote an identifier, escaping embedded double quotes. Column
    names come from PRODUCER-CONTROLLED JSON keys (schema inference
    freezes raw keys as field names), so an unescaped quote would break
    out of the identifier — killing the sink query permanently at best,
    executing crafted DDL in the warehouse at worst (r5 review)."""
    return '"' + name.replace('"', '""') + '"'


def create_table_ddl(table: str, schema: T.StructType) -> str:
    """CREATE TABLE IF NOT EXISTS t (col TYPE [NOT NULL], …) —
    schemaToCreateTable parity (duckdb/sink.go:184-209)."""
    cols = ", ".join(
        f"{_quote_ident(f.name)} {spark_type_to_sql(f.dataType)}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    return f"CREATE TABLE IF NOT EXISTS {_quote_ident(table)} ({cols})"


def _fsync_dir(path: str) -> None:
    """Durably persist a directory's entries (rename/link visibility after
    power loss). Best-effort on filesystems/objects stores that reject
    opening a directory."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _sink_run_id(checkpoint_dir: str) -> str:
    """A run id that is stable across restarts of the SAME checkpoint but
    distinct for every fresh checkpoint. Stored as a marker file inside
    the checkpoint dir, so it shares the checkpoint's lifetime: wiping the
    checkpoint (batch ids restart at 0) also rotates the run id, and two
    sink queries with different checkpoints never share one. This scopes
    replay cleanup to this query's own prior attempt — a replayed batch id
    from a different run/query can no longer delete committed data."""
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "_roar_run_id")
    claim = marker + ".claim"  # atomic takeover target for empty legacy markers
    try:
        with open(marker, encoding="ascii") as fh:
            existing = fh.read().strip()
        if existing:
            return existing
        # empty marker = a crash between create and write (pre-atomic
        # layout); the authoritative id then lives in the claim file, if
        # any taker already won it
        try:
            with open(claim, encoding="ascii") as fh:
                claimed = fh.read().strip()
            if claimed:
                return claimed
        except FileNotFoundError:
            pass
    except FileNotFoundError:
        pass
    # publish atomically: the id is fully durable in a temp file BEFORE the
    # marker name exists, so no crash or concurrent reader can ever observe
    # a partial/empty id (which would silently become run_id "" for the
    # checkpoint's whole lifetime and re-enable cross-run b{id}- collisions)
    run_id = uuid.uuid4().hex[:8]
    tmp = os.path.join(checkpoint_dir, f"_roar_run_id.tmp.{run_id}")
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(run_id)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, marker)  # atomic first-writer-wins claim
    except FileExistsError:
        with open(marker, encoding="ascii") as fh:
            claimed = fh.read().strip()
        if claimed:  # lost the race to a writer whose link carried its id
            os.remove(tmp)
            return claimed
        # empty legacy marker: take it over through a SECOND
        # first-writer-wins link — an os.replace here could race another
        # taker (both read empty, both replace, two run ids live and the
        # loser's committed files escape replay cleanup; r8 review). The
        # link carries the fully-fsynced id, so a reader never sees an
        # empty claim.
        try:
            os.link(tmp, claim)
        except FileExistsError:
            os.remove(tmp)
            with open(claim, encoding="ascii") as fh:
                return fh.read().strip()
        os.remove(tmp)
        _fsync_dir(checkpoint_dir)
        return run_id
    os.remove(tmp)
    # the marker's DIRECTORY ENTRY must be durable before any data file is
    # committed under this run id: fsync on the tmp file alone leaves the
    # link vulnerable to power loss, after which a restart would mint a
    # fresh run id and the replay cleanup would miss the old prefix —
    # re-introducing the duplicate-rows replay this id exists to prevent
    # (r5 review)
    _fsync_dir(checkpoint_dir)
    return run_id


def start_parquet_sink(parsed: DataFrame, topic: str, base_path: str, checkpoint_base: str):
    """Exactly-once-per-micro-batch append to a per-topic parquet table.
    The checkpoint skips committed batches across restarts, and the
    per-batch b{run_id}-{batch_id}/ commit directory below makes a
    replayed uncommitted batch idempotent — the fix for §2.3.1. Read the
    table with recursiveFileLookup (the CLI store views do) or ATTACH the
    directory in the warehouse. The rename-based commit assumes a posix
    path; on object storage use Delta/Iceberg (atomic append +
    compaction) with the same foreachBatch body."""
    path = os.path.join(base_path, topic)
    checkpoint_dir = os.path.join(checkpoint_base, f"sink-{topic}")
    run_id = _sink_run_id(checkpoint_dir)
    first_batch = {None: True}  # popped by the first _persist (legacy sweep)

    def _persist(batch_df: DataFrame, batch_id: int) -> None:
        # ONE action per micro-batch: a separate count() would re-scan the
        # micro-batch source and double every source metric (the
        # ParquetStore.append rule). Each batch lands in its own staging
        # dir first (leading "_" → invisible to parquet readers, like
        # _SUCCESS), so the row count comes from THIS batch's footers only —
        # a concurrent writer to the same topic path can no longer have its
        # files attributed to this batch. Committed files carry a
        # deterministic b{run_id}-{batch_id}- prefix, and a foreachBatch
        # replay removes only THIS run's previous attempt before
        # re-committing, so the sink is idempotent per (run, batch id) —
        # a fresh checkpoint (ids restart at 0) or a second query sharing
        # the topic dir cannot delete earlier committed rows.
        import shutil

        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        staging = os.path.join(path, f"_staging-{run_id}-{batch_id}")
        shutil.rmtree(staging, ignore_errors=True)  # leftover failed attempt
        batch_df.write.mode("overwrite").parquet(staging)
        n = sum(
            pq.ParquetFile(os.path.join(staging, f)).metadata.num_rows
            for f in os.listdir(staging)
            if f.endswith(".parquet")
        )
        # commit = ONE atomic directory rename into b{run}-{batch}/ (the
        # leading "_" of staging kept it reader-invisible until now).
        # Replay cleanup is a single rmtree of THIS batch's dir — the old
        # flat prefix-file layout string-scanned the entire topic listing
        # on EVERY micro-batch, O(total committed files) driver work that
        # grows forever at a 5 s trigger (r8 review). Readers are
        # unaffected: the store views use recursiveFileLookup, which reads
        # both layouts.
        commit_dir = os.path.join(path, f"b{run_id}-{batch_id}")
        replayed = os.path.isdir(commit_dir)
        shutil.rmtree(commit_dir, ignore_errors=True)  # prior attempt's rows
        if first_batch.pop(None, None) is not None:
            # ONE-TIME legacy sweep (first batch of this process only — the
            # sole batch that can replay across a code upgrade): a prior
            # attempt committed under the pre-r8 FLAT layout
            # (b{run}-{batch}-*.parquet files directly in path) is invisible
            # to the commit-dir check above and would duplicate this batch's
            # rows once. Same run_id (checkpoint-persistent), so the prefix
            # identifies exactly this batch's legacy files. Not per-batch:
            # that would reintroduce the O(total committed files) listing
            # the r8 review removed.
            legacy_prefix = f"b{run_id}-{batch_id}-"
            for f in os.listdir(path):
                if f.startswith(legacy_prefix) and f.endswith(".parquet"):
                    os.remove(os.path.join(path, f))
                    replayed = True
        os.replace(staging, commit_dir)
        if not replayed:
            # a replay REPLACES the prior attempt's rows — incrementing
            # again would drift the counter above actual table rows
            # (mirrors insert_batch_exactly_once returning 0 on replay)
            from roar_spark.metrics import REGISTRY

            REGISTRY.inc("roar_duckdb_insert_rows_total", n, topic=topic)

    return (
        parsed.writeStream.foreachBatch(_persist)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"roar-sink-{topic}")
        .start()
    )


_HWM_DDL = (
    "CREATE TABLE IF NOT EXISTS _roar_sink_batches"
    " (topic VARCHAR, batch_id BIGINT, PRIMARY KEY (topic, batch_id))"
)


def insert_batch_exactly_once(con, table: str, topic: str, batch_id: int, pdf) -> int:
    """Insert one micro-batch into an open DuckDB connection, guarded by a
    high-water-mark table — the transactional fix for the reference's
    duplicating poll loop (duckdb/sink.go:89-125 re-inserts every buffered
    batch each tick; §2.3.1). The data insert and the batch-id record
    commit atomically, so a foreachBatch retry of an already-landed batch
    is a no-op. ``pdf`` is anything duckdb can register — the production
    path passes an Arrow table (type-preserving; see start_duckdb_sink).
    Returns rows inserted (0 on replay)."""
    con.execute(_HWM_DDL)
    seen = con.execute(
        "SELECT 1 FROM _roar_sink_batches WHERE topic = ? AND batch_id = ?",
        [topic, batch_id],
    ).fetchone()
    if seen:
        return 0
    con.execute("BEGIN")
    try:
        con.register("_roar_batch", pdf)
        con.execute(f"INSERT INTO {_quote_ident(table)} SELECT * FROM _roar_batch")
        con.execute(
            "INSERT INTO _roar_sink_batches VALUES (?, ?)", [topic, batch_id]
        )
        con.execute("COMMIT")
    except Exception:
        con.execute("ROLLBACK")
        raise
    finally:
        con.unregister("_roar_batch")
    return len(pdf)


def start_duckdb_sink(parsed: DataFrame, topic: str, db_path: str, checkpoint_base: str):
    """The reference's DuckDB persist loop, actually runnable: one table
    per topic (DDL from create_table_ddl), every micro-batch landed in a
    DuckDB database file with exactly-once semantics (streaming checkpoint
    for restarts + the high-water-mark transaction for foreachBatch
    replays — see insert_batch_exactly_once).

    The insert is driver-side by design: a DuckDB file is a single-writer
    embedded database, so per-executor writes cannot exist — the batch is
    collected through Arrow and appended in one transaction. At cluster
    scale the equivalent contract is start_parquet_sink (object storage,
    per-executor writes) with the warehouse ATTACHing the parquet
    directory; this sink is the literal-parity path for the reference's
    single-node deployment (duckdb/sink.go:128-156)."""
    import duckdb

    schema = parsed.schema

    def _persist(batch_df: DataFrame, batch_id: int) -> None:
        # toArrow, NOT toPandas: pandas degrades a nullable int64 column to
        # float64 (one NULL in the batch → every id >= 2^53 silently
        # rounded before the INSERT; r8 review). Arrow keeps int64+nulls
        # losslessly and duckdb registers it directly — the same
        # type-preserving collect MemoryStore.append uses.
        batch = batch_df.toArrow()
        con = duckdb.connect(db_path)
        try:
            con.execute(create_table_ddl(topic, schema))
            n = insert_batch_exactly_once(con, topic, topic, batch_id, batch)
        finally:
            con.close()
        if n:
            from roar_spark.metrics import REGISTRY

            REGISTRY.inc("roar_duckdb_insert_rows_total", n, topic=topic)

    return (
        parsed.writeStream.foreachBatch(_persist)
        .option("checkpointLocation", os.path.join(checkpoint_base, f"duckdb-sink-{topic}"))
        .queryName(f"roar-duckdb-sink-{topic}")
        .start()
    )
