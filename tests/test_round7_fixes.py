"""Round-7 fixes: restart-safe drift-monitor tokens, cached bloom-sync
manifests, and related regressions."""

import pytest
from pyspark.sql import functions as F


def _vocab_monitor(spark, tmp_path, name, **kw):
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift

    return IncrementalVocabDrift(
        spark, str(tmp_path / name), text_col="text", group_col="lang",
        n_buckets=32, **kw,
    )


def test_attach_without_stable_token_raises(spark, tmp_path):
    """attach() must refuse the per-instance uuid default: a restarted
    checkpointed query would replay its last uncommitted batch under a
    NEW token and double-count it."""
    from etielle_spark.streaming.incremental_drift import (
        IncrementalBinnedKS,
        IncrementalPSI,
        IncrementalVocabDrift,
    )

    mons = [
        IncrementalVocabDrift(spark, str(tmp_path / "vd")),
        IncrementalPSI(
            spark, str(tmp_path / "psi"), value_col="v", group_col="g",
            ref_group="a",
        ),
        IncrementalBinnedKS(
            spark, str(tmp_path / "ks"), value_col="v", group_col="g",
            edge_group="a",
        ),
    ]
    for mon in mons:
        with pytest.raises(ValueError, match="restart-safe"):
            mon.attach()
        # both escape hatches work
        assert callable(mon.attach(checkpoint_location=str(tmp_path / "ck")))
    safe = _vocab_monitor(spark, tmp_path, "vd2", run_id="r1")
    assert callable(safe.attach())


def test_drift_monitor_crash_replay_single_count(spark, tmp_path):
    """The double-count scenario the round-6 default allowed: process a
    batch, 'crash' (new monitor instance, same state dir), replay the
    same batch_id through the new instance's attach() with the SAME
    checkpoint location — merged counts must equal a single pass."""
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift

    df = spark.createDataFrame(
        [(f"alpha beta w{i}", "g0") for i in range(20)]
        + [(f"gamma delta w{i}", "g1") for i in range(20)],
        "text string, lang string",
    )
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    m1 = IncrementalVocabDrift(
        spark, state, text_col="text", group_col="lang", n_buckets=32
    )
    m1.attach(checkpoint_location=ckpt)(df, 0)
    single = sorted(map(tuple, m1.counts().collect()))

    # driver restart: a brand-new instance (fresh uuid default inside),
    # same state dir + checkpoint; Spark replays uncommitted batch 0
    m2 = IncrementalVocabDrift(
        spark, state, text_col="text", group_col="lang", n_buckets=32
    )
    m2.attach(checkpoint_location=ckpt)(df, 0)
    merged = sorted(map(tuple, m2.counts().collect()))
    assert merged == single  # overwrite, not a second copy

    # and the next batch still appends normally
    m2.attach(checkpoint_location=ckpt)(df, 1)
    doubled = {(r["group"], r["bucket"]): r["cnt"] for r in m2.counts().collect()}
    base = {(g, b): c for g, b, c in single}
    assert doubled == {k: 2 * v for k, v in base.items()}


def test_drift_monitor_explicit_run_id_crash_replay(spark, tmp_path):
    """Same crash-replay contract via an explicit run_id (the documented
    alternative to checkpoint_location), for the PSI monitor."""
    from etielle_spark.operators.profile import psi_drift
    from etielle_spark.streaming.incremental_drift import IncrementalPSI

    df = spark.createDataFrame(
        [(float(i % 17), "ref") for i in range(60)]
        + [(float(i % 11) + 2.0, "cand") for i in range(60)],
        "v double, g string",
    )

    def mk():
        return IncrementalPSI(
            spark, str(tmp_path / "psi_state"), value_col="v", group_col="g",
            ref_group="ref", bins=5, run_id="ckpt-tied",
        )

    mk().attach()(df, 0)
    mk().attach()(df, 0)  # replayed after a crash — must overwrite
    got = sorted(map(tuple, mk().psi().collect()))
    want = sorted(
        map(tuple, psi_drift(df, "v", "g", ref_group="ref", bins=5).collect())
    )
    assert got == want


def test_incremental_exact_dedup_cached_manifests(spark, tmp_path):
    """Steady-state batches reuse the in-memory manifest + merged-words
    caches; exactness must hold through one instance's lifetime AND for
    a cold instance reading the same on-disk state."""
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(90)
    b1 = docs.filter("doc_id % 3 = 0")
    b2 = docs.filter("doc_id % 3 = 1").union(b1.limit(10))  # 10 history dups
    b3 = b2.limit(5).union(docs.filter("doc_id % 3 = 2"))   # 5 more dups

    inc = IncrementalExactDedup(
        spark, str(tmp_path / "idx"), bloom_bits=1 << 16, bloom_hashes=4
    )
    got = []
    for b in (b1, b2, b3):
        out = inc.process_batch(b)
        got.append({r["doc_id"] for r in out.collect()})
        out.unpersist()
    # batch caches were exercised: after batch 1 the manifests live on
    # the instance
    assert inc._meta_cache is not None and inc._covered_cache

    seen = set()
    for b, g in zip((b1, b2, b3), got):
        # first occurrence per digest, against history and within batch
        want_ids = set()
        batch_seen = set(seen)
        for r in sorted(b.select("doc_id", "text").collect(), key=lambda r: r["doc_id"]):
            if r["text"] not in batch_seen:
                batch_seen.add(r["text"])
                want_ids.add(r["doc_id"])
        assert g == want_ids
        seen = batch_seen

    # cold instance, same dirs: caches empty, disk state must be complete
    cold = IncrementalExactDedup(
        spark, str(tmp_path / "idx"), bloom_bits=1 << 16, bloom_hashes=4
    )
    out = cold.process_batch(b3)  # all b3 docs are history now
    assert out.count() == 0
    out.unpersist()


def test_index_read_errors_surface(spark, tmp_path):
    """A non-path-missing error while listing the index must RAISE, not
    read as 'no history' (which would emit seen digests as new)."""
    from etielle_spark.streaming.incremental_dedup import IncrementalExactDedup

    bad = tmp_path / "idx"
    bad.mkdir()
    (bad / "part-00000.parquet").write_text("this is not parquet")
    inc = IncrementalExactDedup(spark, str(bad))
    with pytest.raises(Exception) as ei:
        inc._index_files()
    assert "PATH_NOT_FOUND" not in str(ei.value)
