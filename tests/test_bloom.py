"""Distributed Bloom filter (sketches.bloom_*): the filter is a plain
DataFrame of bitmap words, so it must (a) never produce a false
negative, (b) merge across corpus increments via union + bit_or, and
(c) leave bloom_anti_join EXACTLY equal to a plain left-anti join —
the filter prunes, it never decides."""

from __future__ import annotations

from pyspark.sql import functions as F

from etielle_spark.operators.sketches import (
    bloom_anti_join,
    bloom_build,
    bloom_probe,
)


def _docs(spark):
    rows = [(i, f"doc-{i % 40}") for i in range(120)]  # dup keys on purpose
    rows += [(900, None), (901, None)]  # NULL keys
    return spark.createDataFrame(rows, "id long, key string")


def test_bloom_no_false_negatives(spark):
    df = _docs(spark)
    words = bloom_build(df, "key", num_bits=1 << 12, num_hashes=5)
    probed = bloom_probe(df, words, "key", num_bits=1 << 12, num_hashes=5)
    misses = probed.filter(
        F.col("key").isNotNull() & ~F.col("might_contain")
    ).count()
    assert misses == 0  # every inserted key must probe True


def test_bloom_null_keys_probe_false(spark):
    df = _docs(spark)
    words = bloom_build(df, "key", num_bits=1 << 12, num_hashes=5)
    probed = bloom_probe(df, words, "key", num_bits=1 << 12, num_hashes=5)
    assert probed.filter(F.col("key").isNull()).count() == 2
    assert (
        probed.filter(F.col("key").isNull() & F.col("might_contain")).count() == 0
    )


def test_bloom_fp_rate_is_sane(spark):
    ref = spark.createDataFrame([(f"in-{i}",) for i in range(200)], "key string")
    out = spark.createDataFrame([(f"out-{i}",) for i in range(400)], "key string")
    # ~16 bits/key, k=5 => designed FP well under 1%; allow generous slack.
    words = bloom_build(ref, "key", num_bits=1 << 12, num_hashes=5)
    fp = (
        bloom_probe(out, words, "key", num_bits=1 << 12, num_hashes=5)
        .filter(F.col("might_contain"))
        .count()
    )
    assert fp <= 20


def test_bloom_merge_union_bit_or(spark):
    a = spark.createDataFrame([(f"a-{i}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(50)], "key string")
    merged = (
        bloom_build(a, "key", num_bits=1 << 10, num_hashes=4)
        .unionByName(bloom_build(b, "key", num_bits=1 << 10, num_hashes=4))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    direct = bloom_build(a.unionByName(b), "key", num_bits=1 << 10, num_hashes=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def _anti_join_case(spark, num_bits):
    new = spark.createDataFrame(
        [(i, f"k-{i % 30}") for i in range(60)] + [(800, None)],
        "id long, key string",
    )
    ref = spark.createDataFrame(
        [(f"k-{i}",) for i in range(0, 30, 2)] + [(None,)], "key string"
    )
    got = bloom_anti_join(
        new, ref, "key", num_bits=num_bits, num_hashes=5
    )
    want = new.join(
        ref.filter(F.col("key").isNotNull()).distinct(), ["key"], "left_anti"
    )
    assert sorted((r.id, r.key) for r in got.collect()) == sorted(
        (r.id, r.key) for r in want.collect()
    )


def test_bloom_anti_join_exact(spark):
    _anti_join_case(spark, 1 << 12)


def test_bloom_anti_join_exact_even_with_tiny_saturated_filter(spark):
    # 64-bit filter saturates => everything is a candidate; the exact
    # confirm join must still produce the correct result.
    _anti_join_case(spark, 64)


def test_bloom_build_validates(spark):
    df = spark.createDataFrame([("x",)], "key string")
    import pytest

    with pytest.raises(ValueError):
        bloom_build(df, "key", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "key", num_hashes=0)


def test_incremental_exact_dedup_bloom_differential(spark, tmp_path):
    """Bloom-prefiltered incremental exact dedup must produce the same
    survivors as the plain version batch-for-batch, including replay."""
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    plain = IncrementalExactDedup(spark, str(tmp_path / "idx_plain"))
    bloom = IncrementalExactDedup(
        spark, str(tmp_path / "idx_bloom"), bloom_bits=1 << 12, bloom_hashes=5
    )
    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],
        [(4, "beta"), (5, "gamma"), (6, "delta")],
        [(7, "gamma"), (8, "epsilon"), (9, "epsilon"), (10, "alpha")],
    ]
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got_p = {r["doc_id"] for r in plain.process_batch(df).collect()}
        got_b = {r["doc_id"] for r in bloom.process_batch(df).collect()}
        assert got_p == got_b
    # replaying the last batch drops everything on both
    df = spark.createDataFrame(batches[-1], "doc_id int, text string")
    assert plain.process_batch(df).count() == 0
    assert bloom.process_batch(df).count() == 0


def test_incremental_bloom_dedup_survivor_sets(spark, tmp_path):
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    inc = IncrementalExactDedup(
        spark, str(tmp_path / "idx"), bloom_bits=1 << 12
    )
    s1 = inc.process_batch(
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id int, text string"
        )
    )
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}
    s2 = inc.process_batch(
        spark.createDataFrame(
            [(4, "beta"), (5, "gamma")], "doc_id int, text string"
        )
    )
    assert {r["doc_id"] for r in s2.collect()} == {5}
    # bloom word parquet exists and ORs into a usable filter
    words = spark.read.parquet(str(tmp_path / "idx_bloom"))
    assert words.count() > 0


def test_bloom_probe_engines_agree(spark):
    """bitmap (map-only) and join engines must flag identically,
    including NULL keys and duplicates."""
    from etielle_spark.operators.sketches import bloom_build, bloom_probe

    ref = spark.createDataFrame([(f"in-{i}",) for i in range(100)], "key string")
    probe = spark.createDataFrame(
        [(i, f"in-{i % 150}") for i in range(300)] + [(900, None), (901, None)],
        "id long, key string",
    )
    words = bloom_build(ref, "key", num_bits=1 << 12, num_hashes=5)
    a = {
        (r.id, r.might_contain)
        for r in bloom_probe(
            probe, words, "key", num_bits=1 << 12, num_hashes=5, engine="bitmap"
        ).collect()
    }
    b = {
        (r.id, r.might_contain)
        for r in bloom_probe(
            probe, words, "key", num_bits=1 << 12, num_hashes=5, engine="join"
        ).collect()
    }
    assert a == b
    # NULL keys flag False on both
    assert (900, False) in a and (901, False) in a


def test_bloom_anti_join_prebuilt_words_and_engines(spark):
    from etielle_spark.operators.sketches import bloom_anti_join, bloom_build

    new = spark.createDataFrame(
        [(i, f"k-{i % 30}") for i in range(60)], "id long, key string"
    )
    ref = spark.createDataFrame([(f"k-{i}",) for i in range(0, 30, 2)], "key string")
    want = sorted(
        (r.id, r.key)
        for r in new.join(ref.distinct(), ["key"], "left_anti").collect()
    )
    words = bloom_build(ref, "key", num_bits=1 << 12, num_hashes=5)
    for eng in ("bitmap", "join"):
        got = sorted(
            (r.id, r.key)
            for r in bloom_anti_join(
                new, ref, "key", num_bits=1 << 12, num_hashes=5,
                words=words, engine=eng,
            ).collect()
        )
        assert got == want


def test_bloom_probe_broadcast_engine_agrees(spark):
    from etielle_spark.operators.sketches import bloom_build, bloom_probe

    ref = spark.createDataFrame([(f"in-{i}",) for i in range(100)], "key string")
    probe = spark.createDataFrame(
        [(i, f"in-{i % 150}") for i in range(300)] + [(900, None)],
        "id long, key string",
    )
    words = bloom_build(ref, "key", num_bits=1 << 12, num_hashes=5)
    outs = {}
    for eng in ("broadcast", "bitmap", "join"):
        outs[eng] = {
            (r.id, r.might_contain)
            for r in bloom_probe(
                probe, words, "key", num_bits=1 << 12, num_hashes=5, engine=eng
            ).collect()
        }
    assert outs["broadcast"] == outs["bitmap"] == outs["join"]
    assert (900, False) in outs["broadcast"]


def test_minhash_base_hash_engines(spark):
    """xxhash64 base: same shape/type, engine-different signatures,
    equivalent estimator quality (near-dup pair shares most slots,
    disjoint pair shares few) — and LSH composes via signatures=."""
    from etielle_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text with no shared shingles at all"),
        ],
        "doc_id long, text string",
    )
    md5 = {r.doc_id: r.signature for r in
           minhash_signatures(docs, "doc_id", "text").collect()}
    xx = {r.doc_id: r.signature for r in
          minhash_signatures(docs, "doc_id", "text", base_hash="xxhash64").collect()}
    assert set(md5) == set(xx) == {1, 2, 3}
    assert all(len(s) == 16 for s in xx.values())
    assert md5[1] != xx[1]  # engine-specific values
    for sigs in (md5, xx):
        shared_near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
        shared_far = sum(a == b for a, b in zip(sigs[1], sigs[3]))
        assert shared_near > shared_far  # estimator quality holds
    fast_sigs = minhash_signatures(docs, "doc_id", "text", base_hash="xxhash64")
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=8, signatures=fast_sigs
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs
    import pytest

    with pytest.raises(ValueError):
        minhash_signatures(docs, "doc_id", "text", base_hash="sha9000")
