"""Similarity-search tests: exact cosine vs numpy, brute-force top-k
correctness, LSH-ANN recall vs the brute-force baseline."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hurricanedb_spark.catalog.tables import load_table
from hurricanedb_spark.operators import similarity as sim


def test_cosine_fast_matches_numpy(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "x array<float>, y array<float>")
    got = df.select(sim.cosine_fast(F.col("x"), F.col("y")).alias("c")).collect()[0].c
    dot = sum(p * q for p, q in zip(a, b))
    want = dot / (math.sqrt(sum(p * p for p in a)) * math.sqrt(sum(q * q for q in b)))
    assert abs(got - want) < 1e-9


def test_brute_force_topk_shape_and_order(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 3)
    out = sim.brute_force_topk(em, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_ann_recall_vs_brute_force(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    k = 10
    brute = sim.brute_force_topk(em, queries, k=k).collect()
    ann = sim.ann_topk(em, queries, dim=64, k=k).collect()
    bset = {(r.query_id, r.neighbor_id) for r in brute}
    aset = {(r.query_id, r.neighbor_id) for r in ann}
    recall = len(bset & aset) / len(bset)
    # 8 planes + 1-bit probing on 64-dim random data: modest but real recall
    assert recall >= 0.3, recall


def test_quantized_dot_deterministic(spark):
    df = spark.createDataFrame(
        [([0.1, 0.2], [0.3, 0.4])], "x array<float>, y array<float>"
    )
    v1 = df.select(sim.dot_exact(F.col("x"), F.col("y")).alias("d")).collect()[0].d
    v2 = df.select(sim.dot_exact(F.col("x"), F.col("y")).alias("d")).collect()[0].d
    assert v1 == v2
    # scaled integer dot of quantized values
    assert abs(v1 / sim.QSCALE**2 - 0.11) < 1e-5


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    import hurricanedb_spark.operators.similarity as sim
    from hurricanedb_spark.catalog.tables import load_table
    from pyspark.sql import functions as F

    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 5)
    brute = sim.brute_force_topk(em, queries, k=10)
    centroids = sim.train_ivf_centroids(em, n_centroids=16)
    assert len(centroids) == 16 and len(centroids[0]) == 64
    ivf = sim.ivf_topk(em, queries, centroids, k=10, n_probe=4)
    bset = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    iset = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(bset & iset) / len(bset)
    # probing 4/16 data-adapted cells on 64-dim data: should beat the
    # random-plane LSH bound comfortably
    assert recall >= 0.4, recall


def test_ivf_corpus_assignment_is_single_cell(spark, sf_dir):
    import hurricanedb_spark.operators.similarity as sim
    from hurricanedb_spark.catalog.tables import load_table
    from pyspark.sql import functions as F

    em = load_table(spark, sf_dir, "embeddings").limit(200)
    centroids = sim.train_ivf_centroids(em, n_centroids=8)
    cells = em.select(
        sim.ivf_cells(F.col("embedding"), centroids, 1).alias("cells")
    )
    sizes = cells.select(F.size("cells").alias("n")).distinct().collect()
    assert [r.n for r in sizes] == [1]
    dist = em.select(
        sim.ivf_cells(F.col("embedding"), centroids, 1)[0].alias("cell")
    ).groupBy("cell").count().collect()
    assert 1 < len(dist) <= 8  # vectors spread over multiple cells


def test_exact_neardup_guard_names_scale_path(spark, sf_dir):
    import pytest

    em = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(sim.QuadraticPairsError, match="lsh_neardup_pairs"):
        sim.exact_neardup_pairs(em, max_vectors=3).collect()


def test_lsh_neardup_sound_and_recall(spark, sf_dir):
    """LSH near-dup pairs: every returned pair truly >= threshold
    (soundness — the re-rank recomputes the exact metric), and recall vs
    the exact all-pairs baseline is high at cosine 0.95. The natural
    test embeddings contain NO near-dup pairs (checked down to cosine
    0.7), so known pairs are synthesized: a perturbed copy of every
    vector (deterministic elementwise scaling, cosine ~0.999 — close to
    but not exactly parallel, so bucket membership is not trivially
    identical)."""
    em = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pert = em.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x * (1.0 + 0.02 * "
            "((i % 5) - 2) / 10.0) AS FLOAT))"
        ).alias("embedding"),
    )
    both = em.unionByName(pert)
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.lsh_neardup_pairs(both, dim=64, threshold=0.95).collect()
    }
    want = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.exact_neardup_pairs(
            both, threshold=0.95, max_vectors=10_000
        ).collect()
    }
    # soundness: exact-metric re-rank means every emitted pair is real
    for pair, c in got.items():
        assert pair in want and abs(want[pair] - c) < 1e-12
    # recall: bounded, not exact-match — candidate generation is LSH
    assert len(want) >= 100, "perturbed copies must form near-dup pairs"
    assert len(got) / len(want) >= 0.8


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    """Query-side multi-probe (flip the lowest-|margin| plane per table)
    strictly widens the candidate set, so recall vs brute force can only
    rise — measured here as a superset relation on candidate pairs plus
    a recall comparison, at constant corpus-side layout."""
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 10)
    single = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_candidate_pairs(
            em, q, dim=64, probe_flips=0
        ).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_candidate_pairs(
            em, q, dim=64, probe_flips=1
        ).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)  # flips reach genuinely new buckets
    k = 10
    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(em, q, k=k).collect()
    }
    ann0 = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_topk(em, q, dim=64, k=k, probe_flips=0).collect()
    }
    ann1 = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_topk(em, q, dim=64, k=k, probe_flips=1).collect()
    }
    r0 = len(brute & ann0) / len(brute)
    r1 = len(brute & ann1) / len(brute)
    assert r1 >= r0, (r0, r1)
    # expression path refuses flips loudly instead of silently probing
    # base buckets only
    import pytest

    with pytest.raises(ValueError, match="probe_flips"):
        sim.ann_candidate_pairs(em, q, dim=64, kernel=False).count()


def test_auto_tables_operating_points():
    """Table-count sizing holds the recall target as adaptive bits grow
    (the round-10 ADVICE finding: fixed 8 tables decay from ~0.98 recall
    at 9 bits to ~0.64 at 20). Known points at threshold 0.95 / target
    0.98, and the documented cap."""
    assert sim._auto_tables(9, 0.95) == 9
    assert 14 <= sim._auto_tables(14, 0.95) <= 16
    assert 28 <= sim._auto_tables(20, 0.95) <= 34
    assert sim._auto_tables(40, 0.95) == 64  # max_tables cap
    assert sim._auto_tables(40, 0.95, max_tables=512) > 64
    # near-parallel pairs collide in almost any table
    assert sim._auto_tables(4, 0.9999) == 1


def test_adaptive_bits_valid_ranges():
    """bits holds the bucket population ~= target as N grows, and the
    clamp edges behave."""
    assert sim._adaptive_bits(10, 64, (4, 40)) == 4  # N <= target -> lo
    assert sim._adaptive_bits(20_000, 64, (4, 40)) == 9
    assert sim._adaptive_bits(2_000_000, 64, (4, 40)) == 15
    assert sim._adaptive_bits(10**13, 64, (4, 40)) == 38
    assert sim._adaptive_bits(10**15, 64, (4, 40)) == 40  # hi clamp


def test_lsh_neardup_bucket_overflow_is_loud(spark, sf_dir):
    """The degenerate clamp regime (N / 2^bits > max_bucket_size — every
    bucket exceeds the cap, so the hot-bucket filter would drop ALL of
    them) must raise, not return zero pairs silently. Simulated at small
    N with a forced clamp and a tiny cap."""
    import pytest

    em = load_table(spark, sf_dir, "embeddings").limit(300)
    with pytest.raises(sim.LshBucketOverflowError, match="max_bucket_size"):
        sim.lsh_neardup_pairs(
            em, dim=64, bits_range=(4, 4), max_bucket_size=8
        ).collect()
    # same guard on the ann path
    q = em.limit(3)
    with pytest.raises(sim.LshBucketOverflowError, match="max_bucket_size"):
        sim.ann_topk(
            em, q, dim=64, bits_range=(4, 4), max_bucket_size=8
        ).collect()
    # explicit bits bypasses the count and the guard (documented)
    sim.lsh_neardup_pairs(
        em.limit(50), dim=64, bits=4, max_bucket_size=8
    ).count()


def test_ann_candidate_volume_flat_in_n(spark, sf_dir):
    """Adaptive bits keep per-query candidate volume ~n_tables *
    target_bucket as the corpus grows — the fixed-bits defect class made
    it O(N / 2^const). N 250 -> 1000 (4x) lands on bits 4 -> 6 with
    identical expected bucket population (15.6), so candidates per query
    must stay ~flat, not ~4x."""
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    n_q = q.count()

    def per_query(corpus):
        c = sim.ann_candidate_pairs(
            corpus, q, dim=64, target_bucket=16
        ).count()
        return c / n_q

    base = em.select("vec_id", "embedding")
    small = per_query(base.limit(250))
    big = base.unionByName(
        base.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )  # 1000 vectors
    large = per_query(big)
    # flat within noise (bucket-population variance, dedup across
    # tables), emphatically NOT the 4x a fixed-bits join would show
    assert large <= 2.0 * small + 16, (small, large)


def test_ann_hot_bucket_cap_single_corpus_shuffle(spark, sf_dir):
    """Round-12 (r11 verdict #3): the hot-bucket cap must not shuffle
    corpus sketch ROWS. Bucket sizes come from groupBy().count() (the
    only by-bucket exchange carries map-side partial counts) and the few
    oversized buckets are removed by a broadcast LEFT ANTI join — the
    old Window.partitionBy(__bucket) count shuffled every corpus sketch
    row by bucket before the bucket join."""
    import re

    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 8)
    df = sim.ann_candidate_pairs(em, q, dim=64)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan  # the full-row bucket shuffle is gone
    assert "LeftAnti" in plan  # broadcast anti-join removes hot buckets
    # exactly ONE by-bucket exchange, and it sits in the aggregated
    # count branch (partial_count = map-side combine), so it carries
    # (bucket, count) pairs — never the sketch rows
    bucket_ex = [
        ln
        for ln in plan.splitlines()
        if re.search(r"hashpartitioning\(__bucket", ln)
    ]
    assert len(bucket_ex) == 1, bucket_ex
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    # cap semantics unchanged: a degenerate constant-embedding corpus
    # concentrates in one bucket per table; with a small cap every
    # candidate from those buckets is dropped
    const = em.limit(40).select(
        "vec_id", F.expr("transform(embedding, x -> float(0.5))").alias("embedding")
    )
    pairs = sim.ann_candidate_pairs(
        const, const.limit(2), dim=64, bits=4, max_bucket_size=8
    )
    assert pairs.count() == 0


def test_auto_tables_warns_at_cap():
    """Round-12 (r11 verdict #4): past the cap the recall decay is no
    longer silent — a RuntimeWarning names the projected recall at the
    cap and the knobs (the LshBucketOverflowError loud-guard convention
    applied to the last silent degradation in the similarity path)."""
    import warnings

    import pytest

    with pytest.warns(RuntimeWarning, match="max_tables"):
        assert sim._auto_tables(40, 0.95) == 64
    # inside the cap: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert sim._auto_tables(9, 0.95) == 9


def test_lsh_neardup_plan_never_quadratic(spark, sf_dir):
    """The candidate join must be an equi-join on the bucket key — no
    cartesian/broadcast-nested-loop over the corpus."""
    em = load_table(spark, sf_dir, "embeddings")
    df = sim.lsh_neardup_pairs(em, dim=64)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan


def test_precomputed_pair_cosine_bit_identical(spark):
    """Round-15 restructure: the per-vector precompute forms (quantized
    arrays + norms carried through the join) must emit the SAME double,
    bit for bit, as the per-pair cosine_exact / cosine_fast folds they
    replaced — the driver hash-compares results, so ULP drift fails."""
    import random

    rng = random.Random(1157)
    rows = [
        (
            [rng.uniform(-1, 1) for _ in range(64)],
            [rng.uniform(-1, 1) for _ in range(64)],
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "x array<float>, y array<float>")

    qx, qy = sim.quantized_vec(F.col("x")), sim.quantized_vec(F.col("y"))
    exact_pre = sim.dot_quantized(qx, qy).cast("double") / (
        sim.norm_quantized(qx) * sim.norm_quantized(qy)
    )
    fast_pre = sim.dot_fast(F.col("x"), F.col("y")) / (
        sim.norm_fast(F.col("x")) * sim.norm_fast(F.col("y"))
    )
    got = df.select(
        sim.cosine_exact(F.col("x"), F.col("y")).alias("e0"),
        exact_pre.alias("e1"),
        sim.cosine_fast(F.col("x"), F.col("y")).alias("f0"),
        fast_pre.alias("f1"),
    ).collect()
    for r in got:
        assert r.e0 == r.e1, (r.e0, r.e1)  # exact float equality
        assert r.f0 == r.f1, (r.f0, r.f1)
