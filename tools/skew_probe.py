"""AQE skew-join proof: generate a deliberately skewed fact⋈dim join and
event-log-verify that `spark.sql.adaptive.skewJoin` actually splits the
hot partition (r9 verdict item 5 — the conf has been on since r1 but
never shown to fire).

Corpus: FACT (default 16M rows) where one hot key owns ~20% of rows and
the rest spread uniformly over 1M keys, with an incompressible 48-byte
payload so shuffle bytes track row counts; DIM (1M rows) so the join is
a genuine sort-merge (autoBroadcastJoinThreshold=-1 — the registry's
stats-independence discipline, r9). With 32 shuffle partitions the hot
partition carries ~3.6M rows ≈ 210 MB of shuffle vs ~25 MB median — past
the skew bar with skewedPartitionThresholdInBytes=64m (the knob a 100 TB
cluster operator sizes with advisoryPartitionSizeInBytes; the 256 MB
default is tuned for multi-executor clusters, and the probe records the
same mechanism at this box's scale).

One session per mode (eventLog must be set before the context starts):

    python tools/skew_probe.py --mode off   # control: no skew split
    python tools/skew_probe.py --mode on    # AQE splits the hot partition

Each run prints one JSON line: join wall-clock, per-task shuffle-read
max/median for the heaviest shuffle-read stage, task count, and whether
the final adaptive plan marked the join skew=true. PASS = the `on` run
shows skew=true, more join tasks, and max/median shuffle-read collapsing
toward 1; results recorded in SCALE.md r10.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/roar_skew"
EVENTS = f"{BASE}/events"
N_FACT = 16_000_000
N_DIM = 1_000_000
HOT_FRAC = 0.2
CHUNK = 2_000_000


def gen_corpus() -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = {"n_fact": N_FACT, "n_dim": N_DIM, "hot": HOT_FRAC, "v": 2}
    meta_path = f"{BASE}/_meta.json"
    if os.path.exists(meta_path):
        try:
            if json.load(open(meta_path)) == meta:
                return BASE
        except Exception:  # noqa: BLE001 — corrupt stamp → regenerate
            pass
    import shutil

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(f"{BASE}/fact.parquet", exist_ok=True)
    rng = np.random.default_rng(42)
    for start in range(0, N_FACT, CHUNK):
        rows = min(CHUNK, N_FACT - start)
        hot = rng.random(rows) < HOT_FRAC
        k = rng.integers(1, N_DIM, rows, dtype=np.int64)
        k[hot] = 0  # the hot key
        payload = rng.integers(0, 256, (rows, 48), dtype=np.uint8)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(k),
                    "v": pa.array(rng.standard_normal(rows)),
                    "payload": pa.FixedSizeBinaryArray.from_buffers(
                        pa.binary(48), rows, [None, pa.py_buffer(payload.tobytes())]
                    ),
                }
            ),
            f"{BASE}/fact.parquet/part-{start // CHUNK:04d}.parquet",
        )
    rng2 = np.random.default_rng(7)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(np.arange(N_DIM, dtype=np.int64)),
                "grp": pa.array((np.arange(N_DIM) % 50).astype(np.int64)),
                "w": pa.array(rng2.standard_normal(N_DIM)),
            }
        ),
        f"{BASE}/dim.parquet",
    )
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return BASE


def task_shuffle_reads(event_dir: str, app_id: str) -> dict[int, list[int]]:
    """stage id -> per-task shuffle-read bytes, from the event log.
    Handles the v2 layout (eventlog_v2_<app>/events_N_<app> files)."""
    out: dict[int, list[int]] = {}
    paths = [
        p
        for p in glob.glob(f"{event_dir}/**/*", recursive=True)
        + glob.glob(f"{event_dir}/*")
        if app_id in os.path.basename(p) and os.path.isfile(p)
        and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = (ev.get("Task Metrics") or {}).get("Shuffle Read Metrics") or {}
                rd = (m.get("Remote Bytes Read") or 0) + (m.get("Local Bytes Read") or 0)
                out.setdefault(ev["Stage ID"], []).append(rd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["on", "off"], required=True)
    args = ap.parse_args()
    gen_corpus()
    os.makedirs(EVENTS, exist_ok=True)

    from roar_spark.session import get_spark

    spark = get_spark(
        app_name=f"roar_skew_{args.mode}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{EVENTS}",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": str(args.mode == "on").lower(),
            # the skew bar a single-box probe can clear (defaults target
            # multi-executor shuffles): split partitions past 64 MB into
            # ~32 MB advisory chunks
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
        },
    )
    import pyspark.sql.functions as F

    fact = spark.read.parquet(f"{BASE}/fact.parquet")
    dim = spark.read.parquet(f"{BASE}/dim.parquet")
    # payload travels THROUGH the join (max(payload) per group) so the
    # probe measures the real cost of a skewed wide-row shuffle, then a
    # tiny group-by collapses the result
    q = (
        fact.join(dim, "k")
        .groupBy("grp")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("v") * F.col("w")).alias("s"),
            F.max("payload").alias("p"),
        )
    )
    t0 = time.perf_counter()
    rows = q.collect()
    wall = time.perf_counter() - t0
    plan = q._jdf.queryExecution().executedPlan().toString()
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush the event log

    reads = task_shuffle_reads(EVENTS, app_id)
    # the join stage = heaviest total shuffle read
    stage, per_task = max(reads.items(), key=lambda kv: sum(kv[1]))
    per_task = [b for b in per_task if b > 0] or [0]
    med = statistics.median(per_task)
    print(
        json.dumps(
            {
                "mode": args.mode,
                "rows": len(rows),
                "join_wall_sec": round(wall, 1),
                "join_stage": stage,
                "join_tasks": len(per_task),
                "task_shuffle_read_max_mb": round(max(per_task) / 1e6, 1),
                "task_shuffle_read_median_mb": round(med / 1e6, 1),
                "max_over_median": round(max(per_task) / med, 2) if med else None,
                "plan_skew_marked": "skew=true" in plan,
            }
        )
    )


if __name__ == "__main__":
    main()
