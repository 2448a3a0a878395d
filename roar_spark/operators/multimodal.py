"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched Pandas stages.

Pattern (the real thing at 100 TB):
- media rides as a ``binary`` column next to typed metadata (here we
  synthesize it from ``documents.text`` since the corpus ships no media);
  in production it comes from ``spark.read.format("binaryFile")`` or
  parquet with a binary column.
- cheap metadata (byte length, magic-byte sniff) is pure built-in
  expressions — JVM-side, no Python;
- decode / feature-extract runs in ``mapInPandas`` (Arrow batches, one
  Python roundtrip per batch, not per row). The decoder dispatches AT
  RUNTIME: real PIL decode when Pillow is importable on the worker,
  otherwise a clearly marked deterministic stub keyed on the payload
  digest (this container ships no codec libs). The Spark-side plumbing
  (schema, batching, partition independence) is real and tested either
  way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int, n_channels int"
)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata without decoding: byte length and hex magic
    prefix — all JVM-side (oracle-checkable)."""
    docs = load_table(spark, "documents", sf_dir, spread=True)
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.hex(F.substring(payload, 1, 4)).alias("magic_hex"),
        F.md5(F.col("text")).alias("payload_md5"),
    ).orderBy("doc_id")


def _fake_decode(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """STUB decoder — deterministic fake in place of a real codec.

    Used only when no codec library exists in the environment (see
    _pick_decoder); decode properties derive from the payload digest so
    the plumbing stays exercised and deterministic."""
    import hashlib

    h = hashlib.md5(payload).digest()
    fmt = ("jpeg", "png", "webp")[h[0] % 3]
    return fmt, 64 + h[1] % 192, 64 + h[2] % 192, 1 + h[3] % 3


def _real_decode(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """REAL codec path (PIL) — taken automatically when Pillow is
    importable on the worker. Undecodable bytes (this corpus's payloads
    are text stand-ins, not media) yield a loud 'undecodable' row with
    NULL dimensions rather than failing the batch — the behavior a 100 TB
    crawl needs, where some fraction of payloads is always corrupt."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return (
                (im.format or "unknown").lower(),
                im.width,
                im.height,
                len(im.getbands()),
            )
    except Exception:
        return "undecodable", None, None, None


def _pick_decoder():
    """Runtime dispatch: the real PIL decoder when the lib exists, the
    deterministic stub otherwise. Resolved once per kernel invocation ON
    THE WORKER (the driver's environment may differ from executors')."""
    try:
        import PIL.Image  # noqa: F401

        return _real_decode
    except ImportError:
        return _fake_decode


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline over the binary column.

    mapInPandas keeps the Python boundary per-batch; output schema is fixed
    and typed. ENV-CONDITIONAL: with Pillow installed the kernel really
    decodes (corrupt payloads → 'undecodable' + NULL dims); without it the
    deterministic digest stub runs. Rows-only correctness check either way
    (no SQL oracle for a codec); the dispatch and both kernels are pinned
    by tests/test_multimodal.py."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pick_decoder()
        for pdf in batches:
            decoded = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "format": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_channels": [d[3] for d in decoded],
                }
            )

    return docs.mapInPandas(decode_batches, DECODE_SCHEMA).orderBy("doc_id")


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_ts_ms bigint, frame_md5 string"
MAX_FRAMES = 4


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a media column: evenly spaced timestamps, one
    output row per sampled frame — the video-pipeline fan-out shape
    (input rows ≠ output rows through one Arrow-batched stage).

    The payload is ``documents.text`` standing in for media (corpus ships
    none) and the "frame extract" is a deterministic slice+md5 instead of
    a codec — but *deliberately arithmetic*, so unlike the decode stub
    this operator has an EXACT SQL oracle pinning the whole fan-out
    (count, timestamps, per-frame digests) cross-engine. Swapping the
    slice for av.open(...) frame grabs changes no plumbing: same schema,
    same batching, same partition independence. Fake media params:
    duration_ms = 1000·(1 + n_chars mod 60), frames = min(4, 1 + n_chars
    mod 7), frame k at t = ⌊k·duration/frames⌋ sliced 16 chars from
    offset (37k mod max(n_chars−15, 1))."""
    docs = load_table(spark, "documents", sf_dir, spread=True).select("doc_id", "text")

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_ts_ms", "frame_md5")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                n_frames = min(MAX_FRAMES, 1 + n % 7)
                duration_ms = 1000 * (1 + n % 60)
                for k in range(n_frames):
                    start = (k * 37) % max(n - 15, 1)  # 0-based slice start
                    frame = text[start : start + 16]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_ts_ms"].append(k * duration_ms // n_frames)
                    out["frame_md5"].append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return docs.mapInPandas(sample_batches, FRAME_SCHEMA).orderBy("doc_id", "frame_idx")


POOL_SRC = 8  # source grid side (first 64 payload bytes, row-major)
POOL_DST = 4  # pooled grid side (2x2 mean pooling)


def multimodal_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample step of an image pipeline: 2×2 pooling of an
    8×8 grayscale grid to 4×4 — one output row per payload with the pooled
    grid and summary stats.

    Like multimodal_frame_sample (and unlike the decode stub), the pixel
    source is deliberately arithmetic so the WHOLE operator carries an
    exact cross-engine oracle: the "image" is the first 64 bytes of the
    payload (text standing in for media, right-padded with spaces),
    grid[r][c] = code point of byte r·8+c. A real resize swaps this for a
    codec decode in mapInPandas; the pooling math, schema, and plan shape
    are exactly what ships.

    Pooled cells are kept as exact integer SUMS (0..1020) serialized to
    CSV — no float formatting crosses the engine boundary — with the grid
    mean as a round(…,6) double from the same exact integers. Shape: pure
    per-row projection of built-in expressions (substring/ascii), no
    Python, no shuffle before the display sort — embarrassingly parallel
    at any scale."""
    docs = load_table(spark, "documents", sf_dir, spread=True)
    padded = F.rpad(F.col("text"), POOL_SRC * POOL_SRC, " ")

    def px(r: int, c: int) -> F.Column:
        return F.ascii(F.substring(padded, r * POOL_SRC + c + 1, 1))

    pooled = [
        (
            px(2 * pr, 2 * pc)
            + px(2 * pr, 2 * pc + 1)
            + px(2 * pr + 1, 2 * pc)
            + px(2 * pr + 1, 2 * pc + 1)
        ).cast("long")
        for pr in range(POOL_DST)
        for pc in range(POOL_DST)
    ]
    total = pooled[0]
    for p in pooled[1:]:
        total = total + p
    pooled_csv = F.concat_ws(",", *[p.cast("string") for p in pooled])
    return docs.select(
        "doc_id",
        pooled_csv.alias("pooled_csv"),
        F.md5(pooled_csv).alias("pooled_md5"),
        F.round(total.cast("double") / (POOL_SRC * POOL_SRC), 6).alias("mean_byte"),
    ).orderBy("doc_id")


N_FEATURE_BINS = 16
FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sum_bytes bigint, top_bin int, hist_csv string"
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the binary column as an Arrow-batched
    kernel (the brief's decode → FEATURE-EXTRACT stage, with a feature
    the oracle can verify exactly): per payload, the 16-bin byte
    histogram (byte % 16), total bytes, byte sum, and the dominant bin
    (ties → smallest bin). In production the same ``mapInPandas`` slot
    computes embeddings/spectrograms from decoded media; the numpy
    histogram here IS the vectorized batch shape that replaces
    (np.frombuffer + bincount stand in for the codec + feature net).

    Scale shape: one pass, zero shuffles before the display sort — the
    kernel sees Arrow record batches, so Python cost is per-batch, not
    per-row; features are exact integers, so the cross-engine comparison
    needs no float tolerance."""
    docs = load_table(spark, "documents", sf_dir, spread=True)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads are coalesced to b"" upstream; keep the
                # guard so a direct caller can't crash the whole job on
                # one null row (np.frombuffer(None) raises TypeError).
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                hist = np.bincount(b % N_FEATURE_BINS, minlength=N_FEATURE_BINS)
                out.append(
                    (
                        doc_id,
                        int(b.size),
                        int(b.sum()),
                        int(hist.argmax()),  # np.argmax ties → first (smallest bin)
                        ",".join(str(int(c)) for c in hist),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "sum_bytes", "top_bin", "hist_csv"]
            )

    # NULL text → empty payload (all-zero feature row), mirrored in the
    # DuckDB oracle via encode(coalesce(text, '')).
    src = docs.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).cast("binary").alias("payload")
    )
    return src.mapInPandas(_extract, FEATURES_SCHEMA).orderBy("doc_id")
