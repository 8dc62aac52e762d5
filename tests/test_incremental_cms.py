"""IncrementalCMS: streamed Count-Min heavy hitters == batch operator,
replay-idempotent registers, restart-stable attach tokens."""

import pytest
from pyspark.sql import functions as F


def _docs_tokens(spark, lo, hi):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        f"doc_id >= {lo} AND doc_id < {hi}"
    )
    return docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")


def test_incremental_cms_equals_batch(spark, tmp_path):
    """Streamed estimates == batch cms_heavy_hitters over the
    concatenation (same md5 buckets, additive register merge)."""
    from etielle_spark.operators.sketches import cms_heavy_hitters
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    full = _docs_tokens(spark, 0, 120).cache()
    inc = IncrementalCMS(
        spark, str(tmp_path / "cms"), item_col="tok",
        depth=4, width=256, candidate_k=512, run_id="r1",
    )
    for i, batch in enumerate(
        (
            _docs_tokens(spark, 0, 40),
            _docs_tokens(spark, 40, 80),
            _docs_tokens(spark, 80, 120),
        )
    ):
        inc.process_batch(batch, batch_id=i)
    got = [(r["item"], r["est_count"]) for r in inc.heavy_hitters(k=10).collect()]
    want = [
        (r["item"], r["est_count"])
        for r in cms_heavy_hitters(full, "tok", depth=4, width=256, k=10).collect()
    ]
    assert got == want and len(got) == 10
    full.unpersist()


def test_incremental_cms_grouped_and_replay(spark, tmp_path):
    """Per-group top-k matches batch; a replayed batch_id overwrites
    instead of double-counting."""
    from etielle_spark.operators.sketches import cms_heavy_hitters
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    full = _docs_tokens(spark, 0, 120).cache()
    inc = IncrementalCMS(
        spark, str(tmp_path / "cmsg"), item_col="tok", group_cols=["lang"],
        depth=4, width=256, candidate_k=512, run_id="ckpt-tied",
    )
    b0 = _docs_tokens(spark, 0, 60)
    b1 = _docs_tokens(spark, 60, 120)
    inc.process_batch(b0, batch_id=0)
    inc.process_batch(b0, batch_id=0)  # foreachBatch replay after a crash
    inc.process_batch(b1, batch_id=1)
    got = {
        (r["lang"], r["item"], r["est_count"])
        for r in inc.heavy_hitters(k=3).collect()
    }
    want = {
        (r["lang"], r["item"], r["est_count"])
        for r in cms_heavy_hitters(
            full, "tok", group_cols=["lang"], depth=4, width=256, k=3
        ).collect()
    }
    assert got == want and want
    full.unpersist()


def test_incremental_cms_attach_contract(spark, tmp_path):
    """attach() refuses the per-instance uuid default; both escape
    hatches (run_id, checkpoint_location) produce working callables, and
    a restarted instance with the same checkpoint single-counts."""
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    anon = IncrementalCMS(spark, str(tmp_path / "a"), item_col="tok")
    with pytest.raises(ValueError, match="restart-safe"):
        anon.attach()
    ck = str(tmp_path / "ckpt")
    state = str(tmp_path / "s")
    df = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 10 + [(None,)], "tok string"
    )

    m1 = IncrementalCMS(spark, state, item_col="tok")
    m1.attach(checkpoint_location=ck)(df, 0)
    # restart: new instance, same checkpoint, replayed batch 0
    m2 = IncrementalCMS(spark, state, item_col="tok")
    m2.attach(checkpoint_location=ck)(df, 0)
    got = {(r["item"], r["est_count"]) for r in m2.heavy_hitters(k=2).collect()}
    assert got == {("x", 30), ("y", 10)}  # single-counted, NULL dropped


def test_incremental_cms_readstream_e2e(spark, tmp_path):
    """Real readStream -> foreachBatch drive matches the batch operator."""
    from etielle_spark.operators.sketches import cms_heavy_hitters
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    rows = [(f"t{i % 7}",) for i in range(140)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "tok string")
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    inc = IncrementalCMS(
        spark, str(tmp_path / "state"), item_col="tok", candidate_k=32
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(inc.attach(checkpoint_location=str(tmp_path / "ck")))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [(r["item"], r["est_count"]) for r in inc.heavy_hitters(k=8).collect()]
    want = [
        (r["item"], r["est_count"])
        for r in cms_heavy_hitters(df, "tok", k=8).collect()
    ]
    assert got == want


def test_incremental_cms_guards_and_empty(spark, tmp_path):
    """Bad params raise; heavy_hitters before any batch raises; an empty
    batch is a no-op."""
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    with pytest.raises(ValueError, match="depth"):
        IncrementalCMS(spark, str(tmp_path / "x"), item_col="t", width=1)
    with pytest.raises(ValueError, match="candidate_k"):
        IncrementalCMS(spark, str(tmp_path / "x"), item_col="t", candidate_k=0)

    inc = IncrementalCMS(spark, str(tmp_path / "e"), item_col="tok", run_id="r")
    with pytest.raises(ValueError, match="no batches"):
        inc.heavy_hitters()
    inc.process_batch(spark.createDataFrame([], "tok string"), batch_id=0)
    inc.process_batch(
        spark.createDataFrame([("a",)] * 4, "tok string"), batch_id=1
    )
    got = [(r["item"], r["est_count"]) for r in inc.heavy_hitters(k=3).collect()]
    assert got == [("a", 4)]


def test_incremental_cms_param_mismatch_raises(spark, tmp_path):
    """Registers hashed under different (depth, width) must never merge:
    the persisted _meta manifest raises on mismatch (the items are gone,
    so no rebuild is possible — new geometry = new state dir)."""
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    state = str(tmp_path / "s")
    m1 = IncrementalCMS(spark, state, item_col="tok", width=256, run_id="r")
    m1.process_batch(spark.createDataFrame([("a",)] * 3, "tok string"), batch_id=0)
    m2 = IncrementalCMS(spark, state, item_col="tok", width=512, run_id="r")
    with pytest.raises(ValueError, match="depth=4, width=256"):
        m2.process_batch(
            spark.createDataFrame([("a",)], "tok string"), batch_id=1
        )
    with pytest.raises(ValueError, match="width=256"):
        m2.heavy_hitters()
    # matching params keep working
    m3 = IncrementalCMS(spark, state, item_col="tok", width=256, run_id="r")
    assert m3.heavy_hitters(k=1).collect()[0]["item"] == "a"


def test_incremental_cms_null_groups_dropped(spark, tmp_path):
    """NULL group keys are dropped at the source (register weight the
    estimate join could never surface), matching the batch operator."""
    from etielle_spark.operators.sketches import cms_heavy_hitters
    from etielle_spark.streaming.incremental_cms import IncrementalCMS

    df = spark.createDataFrame(
        [("en", "x")] * 5 + [(None, "y")] * 9 + [("de", "z")] * 2,
        "lang string, tok string",
    )
    inc = IncrementalCMS(
        spark, str(tmp_path / "s"), item_col="tok", group_cols=["lang"],
        run_id="r",
    )
    inc.process_batch(df, batch_id=0)
    got = {(r["lang"], r["item"], r["est_count"])
           for r in inc.heavy_hitters(k=2).collect()}
    want = {(r["lang"], r["item"], r["est_count"])
            for r in cms_heavy_hitters(df, "tok", group_cols=["lang"], k=2).collect()}
    assert got == want == {("en", "x", 5), ("de", "z", 2)}
