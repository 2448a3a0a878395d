"""Property test for the packed digit-histogram simhash aggregation.

The 16-bit-lane packing (dedup._PACK_LOOKUP) is subtle enough to deserve
an independent check: for random token digit sequences, decoding the
summed packed lanes must reproduce the direct per-bit majority exactly,
for every bit, up to the documented 65535-token bound.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from roar_spark.operators.dedup import (
    _PACK_FIELD_BITS,
    _PACK_LOOKUP,
    _PACK_MAX_TOKENS,
    SIMHASH_BITS,
)


def _decode_bit(packed_sum: int, n_tok: int, bit_in_digit: int) -> bool:
    lane = (packed_sum >> (_PACK_FIELD_BITS * bit_in_digit)) & _PACK_MAX_TOKENS
    return 2 * lane > n_tok


@given(st.lists(st.integers(0, 15), min_size=1, max_size=400))
@settings(deadline=None, max_examples=200)
def test_packed_decode_equals_direct_majority(digit_values):
    packed = sum(_PACK_LOOKUP[v] for v in digit_values)
    n = len(digit_values)
    for r in range(4):
        direct = sum(1 if (v >> r) & 1 else -1 for v in digit_values)
        assert _decode_bit(packed, n, r) == (direct > 0)


def test_packing_is_exact_at_the_documented_bound():
    from roar_spark.operators.dedup import _PACK_SAFE_TOKENS

    # worst case: every token sets every bit of this digit
    packed = _PACK_LOOKUP[15] * _PACK_SAFE_TOKENS
    for r in range(4):
        lane = (packed >> (_PACK_FIELD_BITS * r)) & _PACK_MAX_TOKENS
        assert lane == _PACK_SAFE_TOKENS  # lanes exact, no cross-lane carry
    # the guard bound keeps the worst case inside a SIGNED 64-bit
    # accumulator (65535 tokens would reach 2^64-1 and wrap — the original
    # bound this test caught)
    assert packed < 2**63
    assert _PACK_LOOKUP[15] * (_PACK_SAFE_TOKENS + 1) >= 2**48 * (2**15)
    assert len(_PACK_LOOKUP) == 16 and SIMHASH_BITS // 4 == 15


def test_hex_prefix_long_equals_digit_loop(spark):
    """The conv-based hex-prefix parse (r6) must be bit-identical to the
    per-digit strpos probes it replaced, across random md5 strings — the
    property the simhash signatures and the KMV sketch both rely on."""
    from pyspark.sql import functions as F

    from roar_spark.functions.text_fns import hex_digit_val, hex_prefix_long

    df = spark.range(2000).select(F.md5(F.col("id").cast("string")).alias("h"))
    loop = F.lit(0).cast("long")
    for i in range(1, 16):
        loop = loop * 16 + hex_digit_val(F.col("h"), i).cast("long")
    bad = df.select(
        hex_prefix_long(F.col("h"), 15).alias("conv"), loop.alias("loop")
    ).filter(F.col("conv") != F.col("loop"))
    assert bad.count() == 0
    # per-digit extraction from the packed long matches hex_digit_val too
    h60 = hex_prefix_long(F.col("h"), 15)
    checks = [
        (
            F.shiftright(h60, 4 * (15 - 1 - d)).bitwiseAND(F.lit(15))
            != hex_digit_val(F.col("h"), d + 1)
        )
        for d in range(15)
    ]
    import functools
    import operator

    mismatch = df.filter(functools.reduce(operator.or_, checks))
    assert mismatch.count() == 0


def test_simhash_fold_matches_python_reference(spark):
    """The r12 array-fold signature build (transform + 15 aggregate folds,
    no explode / no aggregation exchange) must reproduce, bit for bit, a
    pure-Python md5 majority-vote simhash computed independently per doc —
    an implementation-independent pin that survives any future reshaping
    of the Spark expression."""
    import hashlib
    import re

    from roar_spark.operators.dedup import SIMHASH_BITS, simhash_signatures

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    assert len(docs) == len(got)
    n_digits = SIMHASH_BITS // 4
    for row in docs:
        toks = re.split(r"\s+", row["text"].strip().lower())
        counts = [0] * SIMHASH_BITS
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:n_digits], 16)
            # signature bit b votes on bit (b%4) of hex digit (b//4),
            # where digit 0 is the MOST significant nibble of the prefix
            for b in range(SIMHASH_BITS):
                v = (h >> (4 * (n_digits - 1 - b // 4))) & 15
                counts[b] += 1 if (v >> (b % 4)) & 1 else -1
        expected = sum(1 << b for b in range(SIMHASH_BITS) if counts[b] > 0)
        assert got[row["doc_id"]] == expected, row["doc_id"]
