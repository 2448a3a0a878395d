"""Scale proof for the r12 dedup_minhash_lsh verification prune (verdict
r11 item 1): at 1M docs, the candidate-id semi-join must make the
verification shuffle scale with CANDIDATES, not the corpus.

Two modes, one fresh session each (event log needs a fresh context, and
the heavy-op one-per-invocation rule from tools/scale_smoke.py applies):

    python tools/minhash_prune_probe.py --mode pruned     # the shipped gate (1M > 100k)
    python tools/minhash_prune_probe.py --mode unpruned   # gate forced off

Each run prints one JSON line: wall-clock, output rows, TOTAL shuffle
write bytes, and the top-3 per-stage shuffle writes from the event log.
PASS = the unpruned run carries the full ~52M-row shingle collect through
its verification shuffle while the pruned run's verification stages write
megabytes; results recorded in SCALE.md r12.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = "/tmp/roar_minhash_probe_events"
N_DOCS = 1_000_000


def stage_shuffle_writes(event_dir: str, app_id: str) -> dict[int, int]:
    """stage id -> total shuffle WRITE bytes, from the event log."""
    out: dict[int, int] = {}
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
                m = (ev.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                out[ev["Stage ID"]] = out.get(ev["Stage ID"], 0) + (
                    m.get("Shuffle Bytes Written") or 0
                )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["pruned", "unpruned"], required=True)
    ap.add_argument("--n", type=int, default=N_DOCS)
    args = ap.parse_args()

    from tools.scale_smoke import gen_corpus

    corpus = gen_corpus(args.n)
    os.makedirs(EVENTS, exist_ok=True)

    from roar_spark.session import get_spark

    spark = get_spark(
        app_name=f"minhash_probe_{args.mode}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{EVENTS}",
        },
    )
    from roar_spark.operators import dedup

    if args.mode == "unpruned":
        dedup.MINHASH_PRUNE_MIN_DOCS = 1 << 60  # gate forced off
    assert (args.n > dedup.MINHASH_PRUNE_MIN_DOCS) == (args.mode == "pruned")

    t0 = time.perf_counter()
    rows = dedup.dedup_minhash_lsh(spark, corpus).collect()
    wall = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush the event log

    writes = stage_shuffle_writes(EVENTS, app_id)
    top = sorted(writes.items(), key=lambda kv: -kv[1])[:3]
    print(
        json.dumps(
            {
                "mode": args.mode,
                "n_docs": args.n,
                "out_pairs": len(rows),
                "wall_sec": round(wall, 1),
                "total_shuffle_write_mb": round(sum(writes.values()) / 1e6, 1),
                "top_stage_shuffle_write_mb": [
                    {"stage": s, "mb": round(b / 1e6, 1)} for s, b in top
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
