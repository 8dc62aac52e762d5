"""Round-10 hardening regressions.

1. Worker-side package shipping: Arrow-UDF operators must work when the
   driver's cwd is NOT the repo root (reference deployment reality: on a
   real cluster executors never share the driver's cwd, so without
   ``sc.addPyFile`` every ``mapInPandas`` closure dies with a worker-side
   ``ModuleNotFoundError``).  VERDICT r9 item #1.
"""

import os
import subprocess
import sys
import tempfile
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def test_arrow_udf_operators_from_foreign_cwd():
    """One multimodal query + one stateful-streaming batch, driver cwd in
    a tmpdir, package importable ONLY via driver-side sys.path (not
    PYTHONPATH, which local-mode workers would inherit)."""
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})

        from etielle_spark.session import get_spark
        from etielle_spark.operators.multimodal import extract_features, generate_images
        from etielle_spark.streaming.stateful import running_counts

        spark = get_spark("cwd-independence", cpus=2)
        spark.sparkContext.setLogLevel("ERROR")

        # multimodal: generate_images + extract_features both run
        # `from . import imagecodec` INSIDE the Python worker.
        df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, txt string")
        imgs = generate_images(df, "id", "txt")
        feats = extract_features(imgs, "id", decode_stub=False)
        n = feats.count()
        assert n == 2, n

        # stateful streaming: applyInPandasWithState closure unpickles
        # etielle_spark.streaming.stateful on the worker.
        import tempfile as _tf
        src = _tf.mkdtemp(prefix="cwd_state_src_")
        spark.createDataFrame([(1, 10.0), (2, 5.0)], "k long, v double").write.mode(
            "overwrite"
        ).parquet(src + "/b1")
        stream_df = spark.readStream.schema("k long, v double").parquet(src + "/*")
        out = running_counts(stream_df, "k", "v")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("cwd_state_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.sql("SELECT k FROM cwd_state_out").count() == 2

        print("FOREIGN_CWD_OK")
        spark.stop()
        """
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    with tempfile.TemporaryDirectory(prefix="foreign_cwd_") as cwd:
        proc = subprocess.run(
            [sys.executable, "-c", script],
            cwd=cwd,
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "FOREIGN_CWD_OK" in proc.stdout


def test_manifest_rewrite_has_no_missing_window(spark, tmp_path):
    """VERDICT r9 item #2: the round-9 layout deleted the live data.json
    BEFORE renaming the tmp, so a crash in between read as 'never
    written'.  The versioned layout renames FIRST: simulate every crash
    point and assert the manifest always reads as previous-or-new."""
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    d = tmp_path / "_meta"
    write_json_rows(spark, str(d), [{"n": 1}])
    v1 = next(d.glob("data-*.json"))

    # crash point A: tmp written, rename not yet done -> previous wins
    (d / ".data.json.tmp").write_text('{"n": 99}\n')
    assert read_json_rows(spark, str(d)) == [{"n": 1}]
    (d / ".data.json.tmp").unlink()

    # normal rewrite bumps the version and drops the old file
    write_json_rows(spark, str(d), [{"n": 2}])
    v2 = next(d.glob("data-*.json"))
    assert v2.name > v1.name and not v1.exists()
    assert read_json_rows(spark, str(d)) == [{"n": 2}]

    # crash point B: rename done, superseded-file delete not yet done ->
    # both versions on disk, reader takes the numerically greatest
    v1.write_text('{"n": 1}\n')
    assert sorted(p.name for p in d.glob("data-*.json")) == [v1.name, v2.name]
    assert read_json_rows(spark, str(d)) == [{"n": 2}]

    # a legacy data.json left beside a versioned file (crash during the
    # first versioned rewrite of an old-layout dir) is superseded too
    (d / "data.json").write_text('{"n": 0}\n')
    assert read_json_rows(spark, str(d)) == [{"n": 2}]

    # the next write cleans all of it up
    write_json_rows(spark, str(d), [{"n": 3}])
    assert [p.name for p in d.glob("data*.json")] == [
        next(d.glob("data-*.json")).name
    ]
    assert read_json_rows(spark, str(d)) == [{"n": 3}]


def test_manifest_versioning_is_per_directory(spark, tmp_path):
    """recursive=True reads (compaction epoch dirs) apply the
    greatest-version rule within each directory independently —
    sibling epoch manifests all stay live."""
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    root = tmp_path / "epochs"
    write_json_rows(spark, str(root / "epoch=1"), [{"e": 1}])
    write_json_rows(spark, str(root / "epoch=2"), [{"e": 2}])
    # leave a superseded version only in epoch=2
    write_json_rows(spark, str(root / "epoch=2"), [{"e": 2, "v": 2}])
    (root / "epoch=2" / "data-0000000001.json").write_text('{"e": 2}\n')
    rows = read_json_rows(spark, str(root), recursive=True)
    assert sorted(r["e"] for r in rows) == [1, 2]
    assert any(r.get("v") == 2 for r in rows)


def test_pq_codes_derives_geometry_from_codebooks(spark):
    """ADVICE r9 (medium): pq_codes sliced subvectors from the m
    PARAMETER even when explicit codebooks were passed, so
    pq_codes(codebooks=pq_fit(..., m=4)) without repeating m=4 encoded
    wrong-width subvectors silently.  Geometry now comes from the
    codebooks themselves."""
    from etielle_spark.operators.similarity import pq_codebooks, pq_codes

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 40"
    )
    cbs = pq_codebooks(emb, "vec_id", "embedding", m=4, n_centroids=8)

    explicit = pq_codes(
        emb, "vec_id", "embedding", m=4, n_centroids=8, codebooks=cbs
    )
    # the bug: default m=8 with m=4 codebooks silently mis-sliced
    defaulted = pq_codes(emb, "vec_id", "embedding", codebooks=cbs)
    assert explicit.exceptAll(defaulted).count() == 0
    assert defaulted.exceptAll(explicit).count() == 0
    assert defaulted.select("subspace").distinct().count() == 4

    # a contradictory explicit dim raises instead of mis-slicing
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not match the codebooks"):
        pq_codes(emb, "vec_id", "embedding", dim=48, codebooks=cbs)


EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_broadcast_guards_raise_with_shard_hint(spark):
    """VERDICT r9 item #4: the small-by-contract broadcast sides are
    now enforced — an oversized query frame raises the shard hint
    instead of OOMing the broadcast.  Caps are monkeypatched low so the
    violation is cheap to construct."""
    import pytest as _pytest

    from etielle_spark.operators import similarity as sim

    emb = spark.read.parquet(EMB)
    q = emb.limit(10)
    old_q, old_l = sim.MAX_BROADCAST_QUERY_ROWS, sim.MAX_BROADCAST_LUT_ROWS
    sim.MAX_BROADCAST_QUERY_ROWS = 5
    sim.MAX_BROADCAST_LUT_ROWS = 8
    try:
        for op in (sim.brute_force_topk, sim.ivf_topk, sim.lsh_bucket_topk):
            with _pytest.raises(ValueError, match="shard your query"):
                op(emb, q, "vec_id", "embedding", k=3).collect()
        cbs = sim.pq_codebooks(emb, "vec_id", "embedding", m=2, n_centroids=4)
        codes = sim.pq_codes(emb, "vec_id", "embedding", codebooks=cbs)
        with _pytest.raises(ValueError, match="shard your query"):
            sim.pq_topk(codes, q, "vec_id", "embedding", codebooks=cbs, k=3)
    finally:
        sim.MAX_BROADCAST_QUERY_ROWS = old_q
        sim.MAX_BROADCAST_LUT_ROWS = old_l
    # under the real caps the same calls plan fine
    assert sim.brute_force_topk(emb, q, "vec_id", "embedding", k=3).count() > 0


def test_persistent_index_guards_query_side(spark, tmp_path):
    from etielle_spark.operators import similarity as sim
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    idx = PersistentIVFIndex(
        spark, str(tmp_path / "ivf"), nlist=4, pq_m=2, pq_centroids=4
    )
    idx.build(emb)
    old_q, old_l = sim.MAX_BROADCAST_QUERY_ROWS, sim.MAX_BROADCAST_LUT_ROWS
    sim.MAX_BROADCAST_QUERY_ROWS = 5
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError, match="shard your query"):
            idx.query(emb.limit(10), k=3, nprobe=2)
        sim.MAX_BROADCAST_QUERY_ROWS = old_q
        sim.MAX_BROADCAST_LUT_ROWS = 10  # 3 queries x 2 cells x 8 entries = 48
        with _pytest.raises(ValueError, match="shard your query|lower nprobe"):
            idx.query_adc(emb.limit(3), k=3, nprobe=2)
    finally:
        sim.MAX_BROADCAST_QUERY_ROWS = old_q
        sim.MAX_BROADCAST_LUT_ROWS = old_l
    assert idx.query(emb.limit(3), k=3, nprobe=2).count() > 0


def test_pq_fit_reseeds_empty_codes(spark):
    """VERDICT r9 item #5: a code that goes empty in a Lloyd round is
    re-seeded from the round's farthest assigned subvector instead of
    dropping out — codebooks keep full resolution on skewed corpora,
    deterministically."""
    from etielle_spark.operators.similarity import pq_fit

    # 3 distinct vectors, one of them 60x dominant: most of 8 seed codes
    # go empty on the first assignment round
    rows = [(i, [1.0, 1.0, 0.0, 0.0]) for i in range(60)]
    rows += [(100 + i, [0.0, 0.0, 1.0, float(i % 2)]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cbs = pq_fit(emb, "vec_id", "embedding", m=2, n_centroids=8, n_iter=3)
    assert [len(cb) for cb in cbs] == [8, 8], [len(cb) for cb in cbs]
    # deterministic refit
    again = pq_fit(emb, "vec_id", "embedding", m=2, n_centroids=8, n_iter=3)
    assert cbs == again


def test_residual_training_frame_matches_build_distribution(spark, tmp_path):
    """ADVICE r9 (low): pq_books for a residual-mode index must be
    trained on residuals.  residual_training_frame exposes exactly the
    build-internal distribution, pre-build."""
    from etielle_spark.operators.similarity import _seed_vectors, pq_fit
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    cents = _seed_vectors(emb, "vec_id", "embedding", 4)
    idx = PersistentIVFIndex(
        spark, str(tmp_path / "ivfr"), nlist=4, pq_m=2, pq_centroids=4
    )
    frame = idx.residual_training_frame(emb, cents)
    assert frame.columns == ["__id", "__resid"]
    # the seed centroids ARE corpus vectors: their own residuals are zero
    n_zero = frame.filter(
        ~F_exists_nonzero("__resid")
    ).count()
    assert n_zero >= len(cents)

    books = pq_fit(
        frame, "__id", "__resid", m=2, n_centroids=4, salt="ivfpq-residual"
    )
    idx.build(emb, centroids=cents, pq_books=books)
    out = idx.query_adc(emb.limit(3), k=5, nprobe=2)
    assert out.count() > 0


def F_exists_nonzero(col):
    from pyspark.sql import functions as F

    return F.exists(col, lambda x: x != 0)


def test_topk_sharded_equals_unsharded(spark):
    """The guard's shard hint as an API: hash-sharded broadcasts union
    to EXACTLY the unsharded result (each query's top-k depends only on
    its own vector)."""
    import pytest as _pytest

    from etielle_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        topk_sharded,
    )

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 20")

    # set-compare via collect, NOT exceptAll: Spark 4.1's exceptAll
    # rewrite over a union of window'd self-joins trips
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (engine plans execute fine —
    # count/collect/oracle all pass; only the exceptAll rewrite breaks)
    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = brute_force_topk(emb, q, "vec_id", "embedding", k=5, round_cosine=6)
    many = topk_sharded(
        emb, q, "vec_id", "embedding", shard_rows=7, k=5, round_cosine=6
    )
    assert rows(one) == rows(many)

    # works over other broadcast-contract ops too
    ivf_one = ivf_topk(emb, q, "vec_id", "embedding", k=5, round_cosine=6)
    ivf_many = topk_sharded(
        emb, q, "vec_id", "embedding", op=ivf_topk, shard_rows=7, k=5,
        round_cosine=6,
    )
    assert rows(ivf_one) == rows(ivf_many)

    # single shard short-circuits; absurd shard counts raise the
    # second-corpus hint
    assert (
        topk_sharded(emb, q, "vec_id", "embedding", shard_rows=1000, k=5)
        .count() > 0
    )
    with _pytest.raises(ValueError, match="second corpus"):
        topk_sharded(
            emb, q, "vec_id", "embedding", shard_rows=1, max_shards=3, k=5
        )


def test_sharded_defaults_carry_slack_below_the_caps(spark):
    """Hash shards balance only in expectation: the DEFAULT shard size
    must sit at half the binding cap so the inner guard never trips at
    the boundary (the round-10 review catch).  With the row cap
    monkeypatched to 10 and 30 queries, the default harness must split
    into small shards and complete rather than raise."""
    from etielle_spark.operators import similarity as sim

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 30")
    old_q = sim.MAX_BROADCAST_QUERY_ROWS
    sim.MAX_BROADCAST_QUERY_ROWS = 10
    try:
        out = sim.topk_sharded(emb, q, "vec_id", "embedding", k=3, round_cosine=6)
        assert out.select("query_id").distinct().count() == 30
    finally:
        sim.MAX_BROADCAST_QUERY_ROWS = old_q

    # pq shape: the default derives from the LUT cap, not the row cap
    cbs = sim.pq_codebooks(emb, "vec_id", "embedding", m=2, n_centroids=4)
    codes = sim.pq_codes(emb, "vec_id", "embedding", codebooks=cbs)
    old_l = sim.MAX_BROADCAST_LUT_ROWS
    sim.MAX_BROADCAST_LUT_ROWS = 80  # 8 entries/query -> cap 10 -> shards of 5
    try:
        out = sim.topk_sharded(
            codes, q, "vec_id", "embedding", op=sim.pq_topk, codebooks=cbs, k=3
        )
        assert out.select("query_id").distinct().count() == 30
    finally:
        sim.MAX_BROADCAST_LUT_ROWS = old_l


def test_index_query_sharded_equals_unsharded(spark, tmp_path):
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    idx = PersistentIVFIndex(
        spark, str(tmp_path / "ivfshard"), nlist=4, pq_m=2, pq_centroids=4
    )
    idx.build(emb)
    q = emb.filter("vec_id < 12")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = idx.query(q, k=5, nprobe=2)
    many = idx.query_sharded(q, shard_rows=5, k=5, nprobe=2)
    assert rows(one) == rows(many)

    adc_one = idx.query_adc(q, k=5, nprobe=2)
    adc_many = idx.query_sharded(q, shard_rows=5, adc=True, k=5, nprobe=2)
    assert rows(adc_one) == rows(adc_many)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="second corpus|cell layout"):
        idx.query_sharded(q, shard_rows=1, max_shards=3, k=5)


def test_fluent_run_ships_package(spark):
    """Fluent pipelines carry user UDFs (`apply`/`@transform`) that
    pickle by module reference — run() must ship the package even when
    the session was NOT created by get_spark (the driver-gate shape)."""
    from etielle_spark import Field, etl
    from etielle_spark import session as sess
    from etielle_spark.transforms import apply, get

    sess._SHIPPED_APPS.discard(spark.sparkContext.applicationId)
    spark.sparkContext._etielle_spark_shipped = False
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    res = (
        etl(df, spark=spark)
        .map_to(
            "t",
            fields=[
                Field("k", get("k")),
                Field("u", apply(lambda s: s.upper() if s else None, get("v"))),
            ],
            join_on=["k"],
        )
        .run()
    )
    assert [r["u"] for r in res["t"].collect()] == ["A"]
    assert spark.sparkContext._etielle_spark_shipped


def test_ship_package_idempotent(spark):
    """Second call for the same application is a no-op (set lookup), and
    the zip is content-addressed under the system tempdir."""
    from etielle_spark import session as sess

    sess._SHIPPED_APPS.discard(spark.sparkContext.applicationId)
    spark.sparkContext._etielle_spark_shipped = False
    first = sess.ship_package(spark)
    assert first is not None and first.endswith(".zip") and Path(first).exists()
    assert sess.ship_package(spark) is None
    # deterministic: rebuilding the archive for unchanged sources reuses it
    pkg_dir = Path(sess.__file__).resolve().parent
    assert str(sess._package_zip(pkg_dir)) == first
