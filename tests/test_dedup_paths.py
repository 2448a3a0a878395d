"""Equivalence of the two simhash pair stages (all-pairs vs pigeonhole) —
the size-based dispatch must never change results."""

from roar_spark.operators.dedup import dedup_simhash

SF = "/root/testdata/sf0.001"


def test_simhash_pair_stages_agree(spark):
    allpairs = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=False).collect()))
    pigeonhole = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=True).collect()))
    assert allpairs == pigeonhole
    assert len(allpairs) > 0  # the corpus has close pairs at this threshold


def test_min_label_propagation_crosses_chains(spark):
    """A path graph 0-1-2-3 plus singleton 9: the min label must flow the
    whole chain length (multiple BSP rounds) — a single-round bug passes
    on cliques (all the corpus's planted components) but not here."""
    from roar_spark.operators.dedup import min_label_propagation

    docs = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 9]], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 3), (0, 1), (1, 2)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in min_label_propagation(docs, pairs).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (9, 9)}
