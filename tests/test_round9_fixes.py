"""Round-9 receipts.

1. Manifest I/O off the Spark-job path (streaming/manifest.py): the
   round-8 VERDICT bisected the streaming_incremental_dedup 8.2->13.6 s
   bench regression to `_check_geometry` paying a spark.read.json miss
   plus a createDataFrame().write.json job on first contact with a
   fresh index.  The contract (mismatched geometry RAISES) is kept; the
   I/O is now a driver-side Hadoop-FS read/write of one tiny JSON
   object — these tests pin "no Spark job", torn-manifest surfacing,
   partial-write crash behavior, and both-direction layout compat.
2. PersistentIVFIndex build atomicity (round-8 ADVICE): the geometry
   manifest is written LAST as the build-complete marker; a crashed
   build is refused by add()/query() and self-healed by a re-run.
3. PersistentIVFIndex recall receipt (VERDICT #4) and bounded per-cell
   file growth under the attach() default compaction cadence
   (VERDICT #5).
"""

import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _no_group_jobs(spark):
    return set(spark.sparkContext.statusTracker().getJobIdsForGroup())


# --- 1. manifest I/O runs driver-side -------------------------------------


def test_geometry_manifest_check_runs_no_spark_job(spark, tmp_path):
    """First-contact write, matching re-read, AND the mismatch raise all
    complete without launching a single Spark job — the entire round-8
    streaming_incremental_dedup regression was this path costing one
    read-miss job plus one write job per fresh index."""
    from etielle_spark.streaming.incremental_drift import _check_geometry

    meta = str(tmp_path / "_meta")
    before = _no_group_jobs(spark)
    _check_geometry(spark, meta, "T", str(tmp_path), {"n": 3, "bands": 4})
    _check_geometry(spark, meta, "T", str(tmp_path), {"n": 3, "bands": 4})
    with pytest.raises(ValueError, match="built with"):
        _check_geometry(spark, meta, "T", str(tmp_path), {"n": 5, "bands": 4})
    assert _no_group_jobs(spark) == before


def test_lsh_dedup_first_contact_meta_check_no_job(spark, tmp_path):
    """The bench-regressed call site itself: a fresh IncrementalLSHDedup
    instance's first _check_meta on an unborn index dir is job-free."""
    from etielle_spark.streaming.incremental_dedup import IncrementalLSHDedup

    inc = IncrementalLSHDedup(spark, str(tmp_path / "idx"))
    before = _no_group_jobs(spark)
    inc._check_meta()
    assert _no_group_jobs(spark) == before
    # and a second instance re-reading the written manifest: still no job
    again = IncrementalLSHDedup(spark, str(tmp_path / "idx"))
    before = _no_group_jobs(spark)
    again._check_meta()
    assert _no_group_jobs(spark) == before


def test_torn_manifest_raises_never_silent(spark, tmp_path):
    """Unparseable manifest content is corruption and must SURFACE — a
    silent 'no state yet' read would rewrite the geometry pin and wave
    mismatched registers through."""
    from etielle_spark.streaming.incremental_drift import _check_geometry
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    d = tmp_path / "_meta"
    write_json_rows(spark, str(d), [{"n": 3}])
    assert read_json_rows(spark, str(d)) == [{"n": 3}]
    data_file = next(d.glob("data-*.json"))
    data_file.write_text('{"n": 3')  # torn mid-object
    # the local FS also keeps a Hadoop .crc sidecar; drop it so the read
    # reaches the JSON parser (with it, the checksum layer raises first —
    # also a surfaced error, pinned below)
    (d / f".{data_file.name}.crc").unlink()
    with pytest.raises(ValueError, match="corrupt"):
        read_json_rows(spark, str(d))
    with pytest.raises(ValueError, match="corrupt"):
        _check_geometry(spark, str(d), "T", str(tmp_path), {"n": 3})


def test_checksum_mismatch_surfaces(spark, tmp_path):
    """Out-of-band tampering that trips the Hadoop checksum layer also
    SURFACES (as the FS's own error) — never reads as 'no state'."""
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    d = tmp_path / "_meta"
    write_json_rows(spark, str(d), [{"n": 3}])
    next(d.glob("data-*.json")).write_text('{"n": 9}\n')  # stale .crc now mismatches
    with pytest.raises(Exception, match="Checksum|checksum"):
        read_json_rows(spark, str(d))


def test_partial_manifest_write_reads_as_missing(spark, tmp_path):
    """A crash BEFORE the tmp->data.json rename leaves only the hidden
    tmp file: that reads as 'never written' (the write never committed),
    so the next first-contact write simply completes it."""
    from etielle_spark.streaming.incremental_drift import _check_geometry
    from etielle_spark.streaming.manifest import read_json_rows

    d = tmp_path / "_meta"
    d.mkdir()
    (d / ".data.json.tmp").write_text('{"n": 3}\n')
    assert read_json_rows(spark, str(d)) is None
    _check_geometry(spark, str(d), "T", str(tmp_path), {"n": 4})
    assert read_json_rows(spark, str(d)) == [{"n": 4}]


def test_manifest_layout_compat_both_directions(spark, tmp_path):
    """Old Spark-written part-file manifests keep reading through the
    driver-side path (existing state dirs stay valid), and Spark itself
    can read the new single-file layout (external tooling does)."""
    from etielle_spark.streaming.incremental_drift import _check_geometry
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    old = str(tmp_path / "old_meta")
    spark.createDataFrame(
        [(8, 4)], "num_hashes long, bands long"
    ).coalesce(1).write.json(old)
    rows = read_json_rows(spark, old)
    assert rows and int(rows[0]["bands"]) == 4
    _check_geometry(spark, old, "T", "s", {"num_hashes": 8, "bands": 4})
    with pytest.raises(ValueError, match="built with"):
        _check_geometry(spark, old, "T", "s", {"num_hashes": 8, "bands": 5})
    # a driver-side rewrite replaces the Spark part files cleanly
    write_json_rows(spark, old, [{"num_hashes": 9, "bands": 4}])
    assert [int(r["num_hashes"]) for r in read_json_rows(spark, old)] == [9]
    # forward direction: Spark reads the new layout
    new = str(tmp_path / "new_meta")
    write_json_rows(spark, new, [{"a": 1}, {"a": 2}])
    assert spark.read.json(new).count() == 2


def test_epoch_manifests_read_driver_side(spark, tmp_path):
    """Compaction's epoch manifests go through the same driver-side
    path: after a fold, deriving the live register set launches no job
    for the MANIFEST read (the register data read itself is Spark)."""
    from etielle_spark.streaming.compaction import _read_manifests
    from etielle_spark.streaming.incremental_drift import IncrementalVocabDrift

    mon = IncrementalVocabDrift(
        spark, str(tmp_path / "s"), n_buckets=64, run_id="r9"
    )
    for b in range(6):
        mon.process_batch(
            spark.createDataFrame([(f"w{b} common text", "g")], "text string, lang string"),
            batch_id=b,
        )
    assert mon.compact(keep_recent=2)
    before = _no_group_jobs(spark)
    live, folded, nxt = _read_manifests(spark, str(tmp_path / "s"))
    assert _no_group_jobs(spark) == before
    assert nxt == 1 and live and folded


# --- 2. IVF build atomicity ------------------------------------------------


def _emb(spark, cond="vec_id < 120"):
    return spark.read.parquet(EMB).filter(cond)


def test_ivf_crashed_build_refused_then_selfheals(spark, tmp_path):
    """A build that crashed before its commit marker (codebook +
    vectors present, _meta absent) must be REFUSED by add()/query()
    instead of silently searching a partial corpus, and a re-run of
    build() must clear the leftovers and reproduce a clean build."""
    import shutil

    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = _emb(spark)
    q = emb.filter("vec_id < 3")
    idx_dir = str(tmp_path / "ivf")
    idx = PersistentIVFIndex(spark, idx_dir, nlist=4)
    idx.build(emb)
    clean = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in idx.query(q, k=5, nprobe=4).collect()
    )
    # simulate the crash window: marker gone, partial state behind
    shutil.rmtree(idx_dir + "/_meta")
    fresh = PersistentIVFIndex(spark, idx_dir, nlist=4)
    with pytest.raises(ValueError, match="no geometry manifest"):
        fresh.add(emb.filter("vec_id < 2"))
    with pytest.raises(ValueError, match="no geometry manifest"):
        fresh.query(q)
    # self-heal: rebuild clears the crashed attempt and completes
    healed = PersistentIVFIndex(spark, idx_dir, nlist=4)
    healed.build(emb)
    again = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in healed.query(q, k=5, nprobe=4).collect()
    )
    assert again == clean


# --- 3. IVF recall receipt + bounded file growth ----------------------------


def test_ivf_recall_receipt_seed_and_kmeans_codebooks(spark, tmp_path):
    """VERDICT r8 #4: turn the 'pass a kmeans_fit codebook for
    production recall' docstring claim into numbers.  At nprobe=nlist
    the index is exhaustive (recall 1.0 per query); at nprobe=3/16 the
    mean recall@10 clears a pinned floor with BOTH the deterministic
    seed codebook and a kmeans_fit codebook.  (The synthetic embeddings
    are near-isotropic, so nprobe=3 recall sits near the
    geometry-bound ~0.43 — measured seed 0.425 / kmeans 0.4625 here,
    0.41 / 0.44 at sf0.01; real clustered corpora sit far higher.)"""
    from etielle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        kmeans_fit,
    )
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 8")
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10)
    km = kmeans_fit(emb, "vec_id", "embedding", nlist=16, n_iter=2)
    km_cents = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in km.collect()
    )
    for tag, cents in (("seed", None), ("kmeans", km_cents)):
        idx = PersistentIVFIndex(spark, str(tmp_path / f"ivf_{tag}"), nlist=16)
        idx.build(emb, centroids=cents)
        full = ann_recall(exact, idx.query(q, k=10, nprobe=16)).collect()
        assert full and all(r["recall"] == pytest.approx(1.0) for r in full)
        part = ann_recall(exact, idx.query(q, k=10, nprobe=3)).collect()
        mean = sum(r["recall"] for r in part) / len(part)
        assert mean >= 0.35, f"{tag} nprobe=3 mean recall {mean}"


def test_ivf_attach_default_bounds_files_per_cell(spark, tmp_path):
    """VERDICT r8 #5: a many-batch ingest under attach()'s DEFAULT
    cadence keeps per-cell file counts bounded (~compact_every), instead
    of growing O(batches x cells); files_per_cell() is the probe."""
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    idx = PersistentIVFIndex(spark, str(tmp_path / "ivf"), nlist=2)
    idx.build(emb.filter("vec_id < 40"))
    fn = idx.attach()  # default compact cadence
    for b in range(20):
        lo = 40 + 2 * b
        fn(emb.filter(f"vec_id >= {lo} and vec_id < {lo + 2}"), b)
    fpc = idx.files_per_cell()
    assert fpc, "no cells written"
    # 20 one-file-per-cell appends uncompacted would exceed 20 files in
    # some cell; the default cadence (compact every 8) bounds it
    assert max(fpc.values()) <= 10, fpc
    # and the index still answers
    assert idx.query(emb.filter("vec_id < 2"), k=5, nprobe=2).count() > 0


# --- 4. PQ ADC search (new this round) --------------------------------------


def test_pq_topk_exact_when_codebook_is_the_corpus(spark):
    """Correctness pin for the ADC math: with m=1 and every corpus
    vector its own centroid, encoding is the identity and the ADC
    distance IS the true squared-L2 — on unit vectors that ranking is
    exactly brute-force cosine top-k (L2^2 = 2 - 2cos), so recall must
    be 1.0 per query."""
    from etielle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        pq_codebooks,
        pq_codes,
        pq_topk,
    )

    emb = spark.read.parquet(EMB).filter("vec_id < 30")
    cbs = pq_codebooks(emb, "vec_id", "embedding", m=1, n_centroids=30)
    codes = pq_codes(
        emb, "vec_id", "embedding", m=1, n_centroids=30, codebooks=cbs
    )
    q = emb.filter("vec_id < 3")
    adc = pq_topk(codes, q, "vec_id", "embedding", codebooks=cbs, k=5)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    recalls = [r["recall"] for r in ann_recall(exact, adc).collect()]
    assert recalls and all(r == pytest.approx(1.0) for r in recalls)


def test_pq_topk_guards_shape_and_recall_lever(spark):
    """The ann_recall acceptance-gate workflow for PQ, with the measured
    geometry lever pinned: doubling m (finer subspaces) must buy recall.
    Absolute numbers are modest BY CONSTRUCTION on the near-isotropic
    synthetic vectors (quantization error dominates when there is no
    cluster structure); the gate, not the number, is the contract."""
    from etielle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        pq_codebooks,
        pq_codes,
        pq_topk,
    )

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 8")
    with pytest.raises(ValueError, match="empty codebooks"):
        pq_topk(emb, q, "vec_id", "embedding", codebooks=[])
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10)
    means = {}
    for m in (8, 16):
        cbs = pq_codebooks(emb, "vec_id", "embedding", m=m, n_centroids=16)
        codes = pq_codes(
            emb, "vec_id", "embedding", m=m, n_centroids=16, codebooks=cbs
        )
        with pytest.raises(ValueError, match="k must"):
            pq_topk(codes, q, "vec_id", "embedding", codebooks=cbs, k=0)
        out = pq_topk(codes, q, "vec_id", "embedding", codebooks=cbs, k=10)
        assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]
        rows = out.collect()
        assert all(r["neighbor_id"] != r["query_id"] for r in rows)
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
        for ranked in per_q.values():
            ranked.sort()
            assert [rk for rk, _ in ranked] == list(range(1, len(ranked) + 1))
            dists = [d for _, d in ranked]
            assert dists == sorted(dists)
        rec = [r["recall"] for r in ann_recall(exact, out).collect()]
        means[m] = sum(rec) / len(rec)
    # measured here: m=8 0.125, m=16 0.3625 (deterministic seeds)
    assert means[8] >= 0.08
    assert means[16] >= 0.30
    assert means[16] > means[8], means


# --- 5. IVF-PQ mode of the persistent index ---------------------------------


def test_ivf_pq_adc_refine_and_replay(spark, tmp_path):
    """IVF-PQ lifecycle in BOTH encodings: codes written at build/add,
    query_adc scans the probed cells as codes only, refine=R re-ranks
    exactly.  The sf0.001 embeddings are isotropic — the worst case for
    residual encoding (subtracting an arbitrary seed centroid doubles
    the variance the codebook covers), so the raw mode scores higher
    here while residual wins on clustered corpora (tools/stress_ann.py
    receipts: residual 0.61 vs raw 0.57 ADC at 5.5k clustered).
    Measured floors (exhaustive probe, deterministic): residual
    ADC 0.175 / refine=8 0.6125; raw ADC 0.2375 / refine=8 0.85.
    A replayed append cannot change ADC results (per-subspace dedup
    before the sum)."""
    from etielle_spark.operators.similarity import ann_recall, brute_force_topk
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 8")
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10)
    floors = {True: (0.15, 0.55), False: (0.20, 0.80)}
    for residual, (f_adc, f_ref) in floors.items():
        idx = PersistentIVFIndex(
            spark,
            str(tmp_path / f"ivf_{residual}"),
            nlist=8,
            pq_m=16,
            pq_centroids=16,
            pq_residual=residual,
        )
        idx.build(emb.filter("vec_id < 400"))
        idx.add(emb.filter("vec_id >= 400"))

        adc = idx.query_adc(q, k=10, nprobe=8)
        assert adc.columns == ["query_id", "neighbor_id", "adc_dist", "rank"]
        rec_adc = [r["recall"] for r in ann_recall(exact, adc).collect()]
        mean_adc = sum(rec_adc) / len(rec_adc)
        assert mean_adc >= f_adc, (residual, mean_adc)

        refined = idx.query_adc(q, k=10, nprobe=8, refine=8)
        assert refined.columns == ["query_id", "neighbor_id", "cosine", "rank"]
        rec_ref = [r["recall"] for r in ann_recall(exact, refined).collect()]
        mean_ref = sum(rec_ref) / len(rec_ref)
        assert mean_ref >= f_ref, (residual, mean_ref)
        assert mean_ref > mean_adc

    idx = PersistentIVFIndex(
        spark, str(tmp_path / "ivf_True"), nlist=8, pq_m=16, pq_centroids=16
    )
    before = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in idx.query_adc(q, k=10, nprobe=8).collect()
    )
    idx.add(emb.filter("vec_id >= 400 and vec_id < 450"))  # replay
    after = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in idx.query_adc(q, k=10, nprobe=8).collect()
    )
    assert after == before
    # encoding mode is geometry: a raw-mode reopen of a residual index
    # must raise, not silently mis-decode
    with pytest.raises(ValueError, match="built with"):
        PersistentIVFIndex(
            spark,
            str(tmp_path / "ivf_True"),
            nlist=8,
            pq_m=16,
            pq_centroids=16,
            pq_residual=False,
        ).query_adc(q)


def test_ivf_pq_geometry_guards_and_back_compat(spark, tmp_path):
    """PQ geometry is index geometry: a PQ-built index refuses a
    pq_m=None reopen (and vice versa), query_adc refuses a non-PQ
    index, refine/pq_m guards raise — and a pre-PQ manifest (no pq
    keys at all) reads as pq-off, so old indexes reopen cleanly."""
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex
    from etielle_spark.streaming.manifest import read_json_rows, write_json_rows

    emb = spark.read.parquet(EMB).filter("vec_id < 120")
    q = emb.filter("vec_id < 2")
    with pytest.raises(ValueError, match="pq_m must"):
        PersistentIVFIndex(spark, str(tmp_path / "x"), pq_m=0)

    plain = PersistentIVFIndex(spark, str(tmp_path / "plain"), nlist=4)
    plain.build(emb)
    with pytest.raises(ValueError, match="without pq_m"):
        plain.query_adc(q)
    with pytest.raises(ValueError, match="built with"):
        PersistentIVFIndex(
            spark, str(tmp_path / "plain"), nlist=4, pq_m=8
        ).query(q)

    pq = PersistentIVFIndex(
        spark, str(tmp_path / "pq"), nlist=4, pq_m=8, pq_centroids=16
    )
    pq.build(emb)
    with pytest.raises(ValueError, match="refine must"):
        pq.query_adc(q, refine=0)
    with pytest.raises(ValueError, match="built with"):
        PersistentIVFIndex(spark, str(tmp_path / "pq"), nlist=4).query(q)

    # pre-PQ manifest: strip the pq keys the way a round-8 index wrote it
    meta = str(tmp_path / "plain" / "_meta")
    rows = read_json_rows(spark, meta)
    old = {k: v for k, v in rows[0].items() if not k.startswith("pq_")}
    write_json_rows(spark, meta, [old])
    reopened = PersistentIVFIndex(spark, str(tmp_path / "plain"), nlist=4)
    assert reopened.query(q, k=3, nprobe=4).count() > 0
    with pytest.raises(ValueError, match="built with"):
        PersistentIVFIndex(
            spark, str(tmp_path / "plain"), nlist=4, pq_m=8
        ).query(q)


def test_pq_fit_trains_better_codebooks_than_seeds(spark):
    """pq_fit is the L2 trainer the PQ family needs (kmeans_fit is
    cosine — the wrong metric for ADC): each Lloyd iteration is one
    corpus scan covering all subspaces, and the trained codebooks beat
    the seed sample's recall.  Measured here (m=16, nc=16):
    seed 0.3625 -> 2 iters 0.3875 -> 4 iters 0.4000 (deterministic)."""
    from etielle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        pq_codebooks,
        pq_codes,
        pq_fit,
        pq_topk,
    )

    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 8")
    with pytest.raises(ValueError, match="n_iter"):
        pq_fit(emb, "vec_id", "embedding", n_iter=0)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10)

    def mean_recall(cbs):
        codes = pq_codes(
            emb, "vec_id", "embedding", m=16, n_centroids=16, codebooks=cbs
        )
        out = pq_topk(codes, q, "vec_id", "embedding", codebooks=cbs, k=10)
        rec = [r["recall"] for r in ann_recall(exact, out).collect()]
        return sum(rec) / len(rec)

    seed = mean_recall(
        pq_codebooks(emb, "vec_id", "embedding", m=16, n_centroids=16)
    )
    fit = mean_recall(
        pq_fit(emb, "vec_id", "embedding", m=16, n_centroids=16, n_iter=4)
    )
    assert fit > seed, (fit, seed)
    assert fit >= 0.38, fit
