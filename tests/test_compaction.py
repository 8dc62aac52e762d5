"""Compaction for the incremental monitors (streaming/compaction.py):
the read path stays O(1) epoch dirs + O(recent) batch dirs no matter how
many micro-batches ever ran, and every fold is lossless — differential
equality against an uncompacted twin, plus crash-window and
replay-after-fold sweeps."""

import os

import pytest
from pyspark.sql import functions as F


def _batch_dir_names(state_dir):
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        d for d in os.listdir(state_dir) if d.startswith("batch=")
    )


def _counts_dict(df):
    return {
        tuple(r[c] for c in df.columns if c != "cnt"): r["cnt"]
        for r in df.collect()
    }


def test_recent_keep_parses_tokens_with_dashes():
    from etielle_spark.streaming.compaction import _recent_keep

    names = [
        "batch=my-run-b7-b0",  # token "my-run-b7" — rpartition from the right
        "batch=my-run-b7-b1",
        "batch=my-run-b7-b2",
        "batch=tok-b0",
        "batch=uabcdef",  # uuid-keyed: always foldable
    ]
    keep = _recent_keep(names, 2)
    assert keep == {"batch=my-run-b7-b1", "batch=my-run-b7-b2", "batch=tok-b0"}


def test_drift_many_batches_compaction_differential(spark, tmp_path):
    """200 micro-batches; compacted monitor's merged state and drift
    scores equal the uncompacted twin's, and the state dir ends at
    O(recent) batch dirs + O(1) epochs instead of 200 dirs."""
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift

    comp_dir, raw_dir = str(tmp_path / "comp"), str(tmp_path / "raw")
    comp = IncrementalVocabDrift(
        spark, comp_dir, text_col="text", group_col="lang",
        n_buckets=16, run_id="r1",
    )
    raw = IncrementalVocabDrift(
        spark, raw_dir, text_col="text", group_col="lang",
        n_buckets=16, run_id="r1",
    )
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for b in range(200):
        rows = [
            ("en", f"{words[b % 5]} {words[(b + 1) % 5]} common"),
            ("fr", f"{words[(b + 2) % 5]} commun"),
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        comp.process_batch(df, batch_id=b)
        raw.process_batch(df, batch_id=b)
        if b % 50 == 49:
            comp.compact(keep_recent=4)

    assert len(_batch_dir_names(raw_dir)) == 200
    n_comp = len(_batch_dir_names(comp_dir))
    assert n_comp <= 8, f"expected O(recent) batch dirs, got {n_comp}"
    epochs = os.listdir(os.path.join(comp_dir, "_epoch_data"))
    assert len(epochs) == 1, f"expected ONE live epoch dir, got {epochs}"

    assert _counts_dict(comp.counts()) == _counts_dict(raw.counts())
    d1 = sorted(map(tuple, comp.drift().collect()))
    d2 = sorted(map(tuple, raw.drift().collect()))
    assert d1 == d2


def test_cms_compaction_differential_and_crash_windows(spark, tmp_path):
    from etielle_spark.streaming.incremental_cms import IncrementalCMS
    from etielle_spark.streaming.incremental_drift import _write_registers

    comp_dir, raw_dir = str(tmp_path / "comp"), str(tmp_path / "raw")
    comp = IncrementalCMS(
        spark, comp_dir, item_col="tok", depth=3, width=32,
        candidate_k=4, run_id="r1",
    )
    raw = IncrementalCMS(
        spark, raw_dir, item_col="tok", depth=3, width=32,
        candidate_k=4, run_id="r1",
    )
    items = ["hot", "warm", "cool", "cold", "x1", "x2", "x3"]
    for b in range(24):
        rows = [(items[i % len(items)],) for i in range(b, b + 12)] + [("hot",)] * 3
        df = spark.createDataFrame(rows, "tok string")
        comp.process_batch(df, batch_id=b)
        raw.process_batch(df, batch_id=b)
        if b % 8 == 7:
            comp.compact(keep_recent=3)

    assert len(_batch_dir_names(comp_dir)) <= 6
    hh_c = sorted(map(tuple, comp.heavy_hitters(k=3).collect()))
    hh_r = sorted(map(tuple, raw.heavy_hitters(k=3).collect()))
    assert hh_c == hh_r
    assert hh_c[0][0] or True  # non-empty shape sanity
    assert _counts_dict(comp.sketch()) == _counts_dict(raw.sketch())

    before = _counts_dict(comp.sketch())

    # crash window A: epoch data written, manifest never committed —
    # the orphan dir must stay invisible to reads
    spark.createDataFrame(
        [(0, 0, 999_999)], "j long, b long, cnt long"
    ).write.mode("overwrite").parquet(comp_dir + "/_epoch_data/e000099")
    assert _counts_dict(comp.sketch()) == before

    # crash window B: a foreachBatch replay re-creates a FOLDED batch
    # dir (same rows the epoch already holds) — it must stay ignored...
    from etielle_spark.operators.sketches import cms_cells

    replay = spark.createDataFrame(
        [(items[i % len(items)],) for i in range(0, 12)] + [("hot",)] * 3,
        "tok string",
    )
    occ = comp._occurrences(replay)
    _write_registers(
        cms_cells(occ, [], depth=3, width=32), comp_dir, "r1", 0
    )
    assert "batch=r1-b0" in _batch_dir_names(comp_dir)
    assert _counts_dict(comp.sketch()) == before
    # ...and the next compact() garbage-collects it
    comp.compact(keep_recent=3)
    assert "batch=r1-b0" not in _batch_dir_names(comp_dir)
    assert _counts_dict(comp.sketch()) == before


def test_attach_compact_every_bounds_state(spark, tmp_path):
    """attach(compact_every=N) folds from inside the foreachBatch
    callback: after 20 batches the state dir is O(recent) batch dirs +
    one epoch, and the merged counts equal an uncompacted twin's."""
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift

    comp_dir, raw_dir = str(tmp_path / "comp"), str(tmp_path / "raw")
    comp = IncrementalVocabDrift(
        spark, comp_dir, text_col="text", group_col="lang",
        n_buckets=16, run_id="rA",
    )
    raw = IncrementalVocabDrift(
        spark, raw_dir, text_col="text", group_col="lang",
        n_buckets=16, run_id="rA",
    )
    fn = comp.attach(compact_every=5)
    for b in range(20):
        df = spark.createDataFrame(
            [("en", f"w{b} w{(b+1) % 7} filler")], "lang string, text string"
        )
        fn(df, b)
        raw.process_batch(df, batch_id=b)
    assert len(_batch_dir_names(comp_dir)) <= 6
    assert os.path.isdir(os.path.join(comp_dir, "_epoch_data"))
    assert _counts_dict(comp.counts()) == _counts_dict(raw.counts())


def test_hll_compaction_exact_and_idempotent(spark, tmp_path):
    from etielle_spark.streaming.incremental_sketch import IncrementalHLL

    d = str(tmp_path / "hll")
    inc = IncrementalHLL(
        spark, d, group_cols=["src"], item_col="item", bucket_hex=2
    )
    for b in range(12):
        df = spark.createDataFrame(
            [("a", f"item-{b}-{i}") for i in range(20)]
            + [("a", "shared"), ("b", f"only-{b}")],
            "src string, item string",
        )
        inc.process_batch(df)
    before = sorted(map(tuple, inc.estimate().collect()))
    n_before = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert inc.compact(min_files=8)
    n_after = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_after < n_before and n_after <= 2
    assert sorted(map(tuple, inc.estimate().collect())) == before

    # idempotent crash window: duplicate register content beside the
    # consolidated file changes nothing (max-merge)
    regs = spark.read.parquet(d)
    regs.write.mode("append").parquet(d)
    assert sorted(map(tuple, inc.estimate().collect())) == before


def test_exact_dedup_compaction_with_bloom(spark, tmp_path):
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    idx = str(tmp_path / "idx")
    inc = IncrementalExactDedup(
        spark, idx, bloom_bits=1 << 14, bloom_hashes=4
    )
    seen = []
    for b in range(10):
        rows = [(f"d{b}-{i}", f"text {b} {i}") for i in range(5)]
        seen.extend(rows)
        out = inc.process_batch(
            spark.createDataFrame(rows, "doc_id string, text string")
        )
        assert out.count() == 5
        inc.release_batch_cache()

    n_before = len(inc._index_files())
    assert inc.compact(min_files=4)
    n_after = len(inc._index_files())
    assert n_after < n_before and n_after <= 2

    # cold instance over the compacted state: full history intact
    cold = IncrementalExactDedup(
        spark, idx, bloom_bits=1 << 14, bloom_hashes=4
    )
    replay = spark.createDataFrame(seen[:12], "doc_id string, text string")
    assert cold.process_batch(replay).count() == 0
    cold.release_batch_cache()
    fresh = spark.createDataFrame(
        [("new-1", "brand new text 1"), ("new-2", "brand new text 2")]
        + seen[:3],
        "doc_id string, text string",
    )
    assert cold.process_batch(fresh).count() == 2
    cold.close()
    inc.close()


def test_dedup_attach_compact_every(spark, tmp_path):
    """attach(sink, compact_every=N) on the exact-dedup monitor folds
    the index from inside the adapter; history and results unchanged."""
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    inc = IncrementalExactDedup(spark, str(tmp_path / "idx"))
    survivors = []
    fn = inc.attach(
        lambda out, bid: survivors.append(out.count()), compact_every=3
    )
    seen = []
    for b in range(9):
        rows = [(f"d{b}-{i}", f"text {b} {i}") for i in range(4)]
        if b > 0:
            rows += seen[:2]  # cross-batch duplicates
        seen.extend(rows[:4])
        fn(spark.createDataFrame(rows, "doc_id string, text string"), b)
    assert survivors == [4] + [4] * 8  # dups dropped every batch
    assert len(inc._index_files()) <= 2  # last fold ran at b=8
    # full history intact after folds
    cold = IncrementalExactDedup(spark, str(tmp_path / "idx"))
    assert cold.process_batch(
        spark.createDataFrame(seen[:10], "doc_id string, text string")
    ).count() == 0
    cold.close()
    inc.close()


def test_compact_on_empty_or_fresh_state_is_noop(spark, tmp_path):
    """Edge sweep: compacting state that does not exist yet (or has too
    few batches to fold) returns False and writes nothing."""
    from etielle_spark.streaming.incremental_cms import IncrementalCMS
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift
    from etielle_spark.streaming.incremental_sketch import IncrementalHLL

    mon = IncrementalVocabDrift(
        spark, str(tmp_path / "never"), text_col="t", group_col="g", run_id="r"
    )
    assert mon.compact() is False
    assert not os.path.exists(str(tmp_path / "never"))

    cms = IncrementalCMS(
        spark, str(tmp_path / "cms"), item_col="t", run_id="r"
    )
    assert cms.compact() is False

    hll = IncrementalHLL(
        spark, str(tmp_path / "hll"), group_cols=[], item_col="t"
    )
    assert hll.compact() is False

    # two batches with keep_recent=4: nothing old enough to fold
    mon2 = IncrementalVocabDrift(
        spark, str(tmp_path / "two"), text_col="text", group_col="lang",
        n_buckets=16, run_id="r",
    )
    df = spark.createDataFrame([("en", "a b c")], "lang string, text string")
    mon2.process_batch(df, batch_id=0)
    mon2.process_batch(df, batch_id=1)
    assert mon2.compact(keep_recent=4) is False
    assert len(_batch_dir_names(str(tmp_path / "two"))) == 2


def test_lsh_dedup_compaction(spark, tmp_path):
    from etielle_spark.streaming.incremental_dedup import IncrementalLSHDedup

    idx = str(tmp_path / "lsh")
    inc = IncrementalLSHDedup(spark, idx, n=2, num_hashes=4, bands=2)
    base = "the quick brown fox jumps over the lazy dog again and again"
    for b in range(6):
        df = spark.createDataFrame(
            [(f"d{b}", base), (f"u{b}", f"totally unrelated words {b} " * 3)],
            "doc_id string, text string",
        )
        inc.process_batch(df).unpersist()
    n_before = len(spark.read.parquet(idx).inputFiles())
    assert inc.compact(min_files=4)
    assert len(spark.read.parquet(idx).inputFiles()) <= 2 < n_before
    # cross-batch pair detection survives compaction
    out = inc.process_batch(
        spark.createDataFrame([("dX", base)], "doc_id string, text string")
    )
    matched = {r["id_b"] for r in out.collect()} | {
        r["id_a"] for r in out.collect()
    }
    out.unpersist()
    assert "dX" in matched and len(matched) >= 6
