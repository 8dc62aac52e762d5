"""Round-2 additions: containment pairs, embedding pooling, nucleus
selection, embedding decontamination, and small-file compaction."""

import math

from pyspark.sql import functions as F


def test_containment_asymmetric_on_prefix(spark):
    # b is the first half of a: containment(b in a) = 1, jaccard ~ 0.5
    words = " ".join(f"w{i}" for i in range(40))
    half = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, words), (2, half), (3, "completely different text entirely")],
        ["doc_id", "text"],
    )
    from etielle_spark.operators.dedup import containment_pairs

    rows = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(df, "doc_id", "text").collect()
    }
    assert set(rows) == {(1, 2)}
    a_in_b, b_in_a = rows[(1, 2)]
    # doc1 has 38 shingles, doc2 has 18, all of doc2's appear in doc1
    assert b_in_a == 1.0
    assert abs(a_in_b - 18 / 38) < 1e-9


def test_containment_candidates_prune(spark):
    words = " ".join(f"w{i}" for i in range(40))
    half = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, words), (2, half), (3, words + " tail")], ["doc_id", "text"]
    )
    from etielle_spark.operators.dedup import containment_pairs

    cands = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    got = containment_pairs(df, "doc_id", "text", candidates=cands).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_pool_embeddings_mean_and_norm(spark):
    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),
            ("a", [0.0, 1.0]),
            ("b", [2.0, 0.0]),
        ],
        ["g", "v"],
    )
    from etielle_spark.operators.similarity import pool_embeddings

    out = {r.g: r for r in pool_embeddings(df, "g", "v").collect()}
    assert out["a"].n_vectors == 2
    # mean (.5,.5) normalized -> (1/sqrt2, 1/sqrt2)
    assert all(abs(x - 1 / math.sqrt(2)) < 1e-9 for x in out["a"].pooled)
    assert out["b"].pooled == [1.0, 0.0]

    raw = {r.g: r for r in pool_embeddings(df, "g", "v", normalize=False).collect()}
    assert raw["a"].pooled == [0.5, 0.5]


def test_nucleus_select_prefix_and_crossing_row(spark):
    # group x: scores 5,3,1,1 (total 10); p=0.8 -> keep 5,3 (cum 8)
    # the crossing row IS included: 5 alone is 0.5 < 0.8 so 3 joins
    df = spark.createDataFrame(
        [("x", 1, 5.0), ("x", 2, 3.0), ("x", 3, 1.0), ("x", 4, 1.0),
         ("y", 5, 1.0)],
        ["g", "id", "s"],
    )
    from etielle_spark.operators.curation import nucleus_select

    got = nucleus_select(df, "g", "s", "id", p=0.8).collect()
    kept = {(r.g, r.id) for r in got}
    assert kept == {("x", 1), ("x", 2), ("y", 5)}
    fr = {r.id: r.cum_frac for r in got}
    assert abs(fr[1] - 0.5) < 1e-9 and abs(fr[2] - 0.8) < 1e-9
    # singleton group keeps its only row at cum_frac 1
    assert abs(fr[5] - 1.0) < 1e-9


def test_nucleus_select_p1_keeps_all(spark):
    df = spark.createDataFrame(
        [("x", i, float(i)) for i in range(1, 6)], ["g", "id", "s"]
    )
    from etielle_spark.operators.curation import nucleus_select

    assert nucleus_select(df, "g", "s", "id", p=1.0).count() == 5


def test_embedding_contamination_flags_known_neighbor(spark):
    # eval vector e; corpus c1 = same direction (cos 1), c2 = orthogonal
    df_eval = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])], ["id", "v"])
    df_corp = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0, 0.0]), (2, [0.0, 3.0, 0.0, 0.0])], ["id", "v"]
    )
    from etielle_spark.operators.decontam import embedding_contamination

    got = embedding_contamination(
        df_corp, df_eval, "id", "v", threshold=0.9, planes=4, dim=4, probes=2
    ).collect()
    assert [(r.id, r.matched_eval_id) for r in got] == [(1, 100)]
    assert abs(got[0].max_cosine - 1.0) < 1e-9


def test_compact_small_files_roundtrip(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)

    from etielle_spark.sources.maintenance import compact_small_files, plan_compaction

    plan = plan_compaction(spark, src, target_file_bytes=1 << 30)
    assert plan["n_files"] == 64 and plan["needed"]

    compact_small_files(spark, src, dst, target_file_bytes=1 << 30)
    out_files = [
        f for f in __import__("os").listdir(dst) if f.endswith(".parquet")
    ]
    assert len(out_files) == 1
    # logical content unchanged
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_compact_sorted_rewrite_prunes(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "sorted")
    spark.range(0, 10_000).withColumn("k", F.col("id") % 100).repartition(
        32
    ).write.parquet(src)

    from etielle_spark.sources.maintenance import compact_small_files

    compact_small_files(
        spark, src, dst, target_file_bytes=1 << 30, sort_within_by=["k"]
    )
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.filter(F.col("k") == 7).count() == 100


def test_embedding_contamination_id_collision_not_dropped(spark):
    """Corpus and eval ids come from independent namespaces — a corpus
    doc whose id EQUALS the matching eval id must still be flagged
    (round-2 ADVICE: a __cid != __eid filter silently dropped it)."""
    df_eval = spark.createDataFrame([(7, [1.0, 0.0, 0.0, 0.0])], ["id", "v"])
    df_corp = spark.createDataFrame(
        [(7, [2.0, 0.0, 0.0, 0.0]), (8, [0.0, 3.0, 0.0, 0.0])], ["id", "v"]
    )
    from etielle_spark.operators.decontam import embedding_contamination

    got = embedding_contamination(
        df_corp, df_eval, "id", "v", threshold=0.9, planes=4, dim=4, probes=2
    ).collect()
    assert [(r.id, r.matched_eval_id) for r in got] == [(7, 7)]


def test_jaccard_similarity_join_candidates_prune(spark):
    """candidates= restricts scoring to the given (id_l, id_r) pairs —
    an uncandidated match must NOT appear, a candidated one must, with
    the same jaccard as the exact path (hand-computed)."""
    from etielle_spark.operators.dedup import jaccard_similarity_join

    left = spark.createDataFrame(
        [(1, "red green blue"), (2, "alpha beta gamma")], ["id", "text"]
    )
    right = spark.createDataFrame(
        [(10, "red green yellow"), (20, "alpha beta gamma")], ["id", "text"]
    )
    cand = spark.createDataFrame([(1, 10)], ["id_l", "id_r"])
    got = {
        (r.id_l, r.id_r): r.jaccard
        for r in jaccard_similarity_join(
            left, right, "id", "text", "id", "text",
            threshold=0.1, candidates=cand,
        ).collect()
    }
    # (1,10): inter {red,green}=2, union 4 -> 0.5; (2,20) pruned out
    assert got == {(1, 10): 0.5}
