"""The r12 signed-long minhash keys must be order-isomorphic to the
portable hex-string minhash (minhash_str): min over the longs, mapped
back through the documented inverse, must equal min over the strings for
every salt — otherwise the banding (and therefore the candidate set and
the oracle hash) drifts."""

import pyspark.sql.functions as F

from roar_spark.functions.text_fns import minhash_signed_sql, minhash_str
from roar_spark.operators.dedup import N_MINHASH


def test_signed_long_min_matches_string_min(spark):
    """Per-group min of the signed-long key, converted back to hex, equals
    the lexicographic min of the 16-char md5 prefix for every salt. The
    synthetic shingles cover both top-bit regimes (md5 prefixes with
    first hex digit < 8 and >= 8 — the sign-flip cases)."""
    # ~2 rows/group: group MINS then span the full hex range, so the
    # sign-flip regime (first digit >= 8) is exercised by the aggregation
    # itself, not only by individual key values
    rows = [(i % 997, f"shingle {i} {'x' * (i % 11)}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, shingle string")

    str_mins = (
        df.groupBy("g")
        .agg(
            *[
                F.min(minhash_str(F.col("shingle"), j)).alias(f"h{j}")
                for j in range(N_MINHASH)
            ]
        )
    )
    m_cols = [f"md5(concat('{j}|', shingle)) AS m{j}" for j in range(N_MINHASH)]
    s_cols = [f"{minhash_signed_sql(f'm{j}')} AS s{j}" for j in range(N_MINHASH)]
    long_mins = (
        df.selectExpr("g", *m_cols)
        .selectExpr("g", *s_cols)
        .groupBy("g")
        .agg(*[F.min(f"s{j}").alias(f"s{j}") for j in range(N_MINHASH)])
        # documented inverse: flip the top bit back, print the 64 raw bits
        .selectExpr(
            "g",
            *[
                f"lower(lpad(hex(s{j} ^ shiftleft(cast(1 as bigint), 63)), 16, '0')) AS h{j}"
                for j in range(N_MINHASH)
            ],
        )
    )
    a = {r["g"]: tuple(r[f"h{j}"] for j in range(N_MINHASH)) for r in str_mins.collect()}
    b = {r["g"]: tuple(r[f"h{j}"] for j in range(N_MINHASH)) for r in long_mins.collect()}
    assert a == b
    # both sign regimes actually exercised: some group min starts >= '8'
    firsts = {h[0] for mins in a.values() for h in mins}
    assert firsts & set("01234567") and firsts & set("89abcdef")


def test_signed_key_total_order_matches_lexicographic(spark):
    """The signed key's ORDER (not just argmin) matches the hex string's
    lexicographic order on a sample — the property the min aggregation
    relies on."""
    md5_sql = "md5(concat('0|', shingle))"
    df = spark.createDataFrame(
        [(f"tok{i}",) for i in range(500)], "shingle string"
    ).selectExpr(
        f"substring({md5_sql}, 1, 16) AS h",
        f"{minhash_signed_sql(md5_sql)} AS s",
    )
    rows = df.collect()
    by_str = [r["s"] for r in sorted(rows, key=lambda r: r["h"])]
    assert by_str == sorted(by_str)


def test_minhash_prune_gate_sides_agree(spark, monkeypatch):
    """dedup_minhash_lsh's candidate-id prune is a size-gated COST switch
    (MINHASH_PRUNE_MIN_DOCS): forcing the pruned path on a corpus below
    the gate must produce the identical result set."""
    from roar_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    plain = sorted(map(tuple, dedup.dedup_minhash_lsh(spark, sf).collect()))
    monkeypatch.setattr(dedup, "MINHASH_PRUNE_MIN_DOCS", 0)
    pruned = sorted(map(tuple, dedup.dedup_minhash_lsh(spark, sf).collect()))
    assert plain == pruned
    assert len(plain) > 0


def test_ngram_prune_gate_sides_agree(spark, monkeypatch):
    """dedup_ngram_jaccard shares dedup_minhash_lsh's candidate-id prune
    gate (r12, free there because cand is always materialized): forcing
    the pruned path on a corpus below the gate must produce the identical
    result set."""
    from roar_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    plain = sorted(map(tuple, dedup.dedup_ngram_jaccard(spark, sf).collect()))
    monkeypatch.setattr(dedup, "MINHASH_PRUNE_MIN_DOCS", 0)
    pruned = sorted(map(tuple, dedup.dedup_ngram_jaccard(spark, sf).collect()))
    assert plain == pruned
    assert len(plain) > 0
