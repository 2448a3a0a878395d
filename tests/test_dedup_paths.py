"""Equivalence of the two simhash pair stages (all-pairs vs pigeonhole) —
the size-based dispatch must never change results."""

from roar_spark.operators.dedup import dedup_simhash

SF = "/root/testdata/sf0.001"


def test_simhash_pair_stages_agree(spark):
    allpairs = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=False).collect()))
    pigeonhole = sorted(map(tuple, dedup_simhash(spark, SF, force_pigeonhole=True).collect()))
    assert allpairs == pigeonhole
    assert len(allpairs) > 0  # the corpus has close pairs at this threshold


def test_simhash_composite_chunk_pairs_agree(spark):
    """The third dispatch tier (multi-index composite chunk-pair keys, the
    > 2M-doc path) must produce the identical pair set: hamming ≤ k over
    k+2 chunks leaves ≥ 2 chunks untouched, so the C(6,2) composite keys
    are a lossless candidate generator (one pigeonhole level up)."""
    import pyspark.sql.functions as F

    from roar_spark.operators.dedup import (
        SIMHASH_HAMMING,
        _simhash_pairs_pigeonhole,
        simhash_signatures,
    )

    sig = simhash_signatures(spark, SF).persist()

    def pairs(composite):
        p = _simhash_pairs_pigeonhole(sig, composite=composite)
        return sorted(
            map(
                tuple,
                p.withColumn(
                    "h", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
                )
                .filter(F.col("h") <= SIMHASH_HAMMING)
                .select("doc_id_a", "doc_id_b")
                .collect(),
            )
        )

    single, composite = pairs(False), pairs(True)
    sig.unpersist()
    assert single == composite
    assert len(single) > 0


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


def test_star_components_matches_min_label_on_random_graphs(spark):
    """Alternating large-star/small-star (the SCALE.md adversarial-
    topology path) must produce exactly the labels min-label propagation
    produces — checked on seeded random graphs AND on a 60-node chain,
    where the star variant must converge in far fewer rounds than the
    chain's diameter (the entire point of the algorithm)."""
    import random

    from roar_spark.operators.dedup import min_label_propagation, star_components

    def compare(n_nodes, edge_list, max_chain_rounds=100):
        docs = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
        pairs = spark.createDataFrame(
            edge_list or [(0, 0)], "doc_id_a long, doc_id_b long"
        )
        if not edge_list:
            pairs = pairs.limit(0)
        want = {
            (r.doc_id, r.cluster_id)
            for r in min_label_propagation(docs, pairs, max_chain_rounds).collect()
        }
        labels, rounds = star_components(docs, pairs)
        got = {(r.doc_id, r.cluster_id) for r in labels.collect()}
        assert got == want
        return rounds

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 25))
        ]
        compare(n, [e for e in edges if e[0] != e[1]])

    # 60-node chain: diameter 59; star must need only O(log n) rounds
    chain = [(i, i + 1) for i in range(59)]
    rounds = compare(60, chain)
    assert rounds <= 12, rounds


def test_star_components_compose_with_embedding_pairs(spark):
    """Cross-family composition: the connected-components operator runs
    unchanged over the EMBEDDING near-dup pair graph (sim_cosine_pairs),
    not just the text-shingle graph — labels must match a driver-side
    union-find over the identical pair list."""
    from pyspark.sql import functions as F

    from roar_spark.operators.dedup import star_components
    from roar_spark.operators.similarity import sim_cosine_pairs

    sf = "/root/testdata/sf0.001"
    pairs = sim_cosine_pairs(spark, sf).select(
        F.col("vec_id_a").alias("doc_id_a"), F.col("vec_id_b").alias("doc_id_b")
    )
    nodes = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select(F.col("vec_id").alias("doc_id"))
    )
    labels, rounds = star_components(nodes, pairs)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}

    # driver-side union-find ground truth
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs.collect():
        a, b = find(p.doc_id_a), find(p.doc_id_b)
        if a != b:
            parent[max(a, b)] = min(a, b)
    n_vecs = nodes.count()
    assert len(got) == n_vecs
    for doc, lbl in got.items():
        assert lbl == find(doc)  # find() self-roots unseen (singleton) docs


def test_block_screen_single_task_path_matches_blocked(spark):
    """The r11 small-corpus single-task screen must yield the same survivor
    pair set as the blocked applyInPandas screen — the n_blocks dispatch
    must never change results."""
    from roar_spark.operators.similarity import (
        COSINE_THRESHOLD,
        _MIN_BLOCKS,
        _block_screen_pairs,
        _with_norm,
    )
    from roar_spark.catalog import load_table

    emb = _with_norm(load_table(spark, "embeddings", SF))

    def pairs(n_blocks):
        df = _block_screen_pairs(spark, emb, n_blocks, COSINE_THRESHOLD)
        return sorted(map(tuple, df.collect()))

    single = pairs(_MIN_BLOCKS)          # fast path (gate: n_blocks <= _MIN_BLOCKS)
    blocked = pairs(_MIN_BLOCKS + 3)     # forced blocked path
    assert single == blocked
    assert len(single) > 0


def test_block_screen_single_task_strips_match_one_shot(spark, monkeypatch):
    """The r12 strip-blocked in-task matmul (peak-memory fix, ADVICE r11)
    must yield the identical survivor set as a one-shot matmul: shrink
    _SCREEN_BLOCK_FLOATS so the corpus is forced through many strips and
    compare against the unshrunken run."""
    from roar_spark.operators import similarity
    from roar_spark.operators.similarity import (
        COSINE_THRESHOLD,
        _MIN_BLOCKS,
        _block_screen_pairs,
        _with_norm,
    )
    from roar_spark.catalog import load_table

    emb = _with_norm(load_table(spark, "embeddings", SF))

    def pairs():
        df = _block_screen_pairs(spark, emb, _MIN_BLOCKS, COSINE_THRESHOLD)
        return sorted(map(tuple, df.collect()))

    one_shot = pairs()  # default budget: corpus fits one strip
    # 1-2 rows per strip at the test corpus size: exercises strip
    # boundaries, the cross-strip upper-triangle cut, and empty strips
    monkeypatch.setattr(similarity, "_SCREEN_BLOCK_FLOATS", 1000)
    stripped = pairs()
    assert stripped == one_shot
    assert len(one_shot) > 0
