"""Equivalence of the two simhash pair stages (all-pairs vs pigeonhole) —
the size-based dispatch must never change results."""

from roar_spark.operators.dedup import dedup_simhash

SF = "/root/testdata/sf0.001"


def test_simhash_pair_stages_agree(spark):
    allpairs = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=False).collect()))
    pigeonhole = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=True).collect()))
    assert allpairs == pigeonhole
    assert len(allpairs) > 0  # the corpus has close pairs at this threshold
