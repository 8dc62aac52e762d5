"""Round-3 operators: full k-means loop, distributed PCA, int8
quantization, temperature mixture sampling."""

import math

import numpy as np
from pyspark.sql import functions as F


def _emb_df(spark, n=40, d=6, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_fit_one_iter_equals_iteration(spark):
    from etielle_spark.operators.similarity import kmeans_fit, kmeans_iteration

    emb = _emb_df(spark)
    a = sorted(
        (r["cell"], r["n_members"], tuple(r["centroid"]))
        for r in kmeans_fit(emb, "vec_id", "embedding", nlist=4, n_iter=1).collect()
    )
    b = sorted(
        (r["cell"], r["n_members"], tuple(r["centroid"]))
        for r in kmeans_iteration(emb, "vec_id", "embedding", nlist=4).collect()
    )
    assert a == b


def test_kmeans_fit_converges_membership(spark):
    """On two well-separated blobs with 2 centroids, members are the blobs
    and total membership is preserved across iterations."""
    from etielle_spark.operators.similarity import kmeans_fit

    rows = [(i, [10.0 + 0.01 * i, 0.1]) for i in range(10)] + [
        (100 + i, [-0.1, 8.0 + 0.01 * i]) for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_fit(emb, "vec_id", "embedding", nlist=2, n_iter=3).collect()
    assert sum(r["n_members"] for r in out) == 20
    assert sorted(r["n_members"] for r in out) == [10, 10]


def test_gram_matrix_sql_vs_arrow_vs_numpy(spark):
    from etielle_spark.operators.similarity import gram_matrix

    emb = _emb_df(spark, n=30, d=5)
    mat = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    want = np.cov(mat, rowvar=False, bias=True)
    for engine in ("sql", "arrow"):
        got = gram_matrix(
            emb, "vec_id", "embedding", center=True, round_to=9, engine=engine
        ).collect()
        assert len(got) == 5 * 6 // 2
        for r in got:
            assert math.isclose(
                r["cov"], want[r["i"], r["j"]], abs_tol=2e-9
            ), (engine, r)


def test_gram_matrix_uncentered(spark):
    from etielle_spark.operators.similarity import gram_matrix

    emb = _emb_df(spark, n=12, d=3)
    mat = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    want = (mat.T @ mat) / mat.shape[0]
    got = gram_matrix(
        emb, "vec_id", "embedding", center=False, round_to=9
    ).collect()
    for r in got:
        assert math.isclose(r["cov"], want[r["i"], r["j"]], abs_tol=2e-9)


def test_pca_fit_matches_numpy_eigh(spark):
    from etielle_spark.operators.similarity import pca_fit

    emb = _emb_df(spark, n=50, d=4, seed=7)
    mat = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    cov = np.cov(mat, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = pca_fit(emb, "vec_id", "embedding", k=2)
    assert [c for c, _ in comps] == [0, 1]
    for rank, (_, got) in enumerate(comps):
        v = vecs[:, order[rank]]
        piv = int(np.argmax(np.abs(v)))
        if v[piv] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-6), rank


def test_pca_project_centered_scores(spark):
    from etielle_spark.operators.similarity import pca_project

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = {
        (r["vec_id"], r["comp"]): r["score"]
        for r in pca_project(
            emb, "vec_id", "embedding", [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            center_means=[2.0, 3.0],
        ).collect()
    }
    assert out == {(1, 0): -1.0, (1, 1): -1.0, (2, 0): 1.0, (2, 1): 1.0}


def test_quantize_int8_roundtrip_and_constant_dim(spark):
    from etielle_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [1.0, 5.0]), (3, [0.5, 5.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_int8(spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [1.0, 5.0]), (3, [0.5, 5.0])],
        "vec_id long, embedding array<double>",
    ), "vec_id", "embedding").collect()}
    # dim 0 spans [0,1] -> codes -128, 127, floor(0.5*255+0.5)-128 = -0
    assert got[1]["codes"][0] == -128
    assert got[2]["codes"][0] == 127
    assert got[3]["codes"][0] == 128 - 128  # 0.5 -> floor(128.0)-128 = 0
    # constant dim encodes to -128 with zero error contribution
    assert all(got[i]["codes"][1] == -128 for i in (1, 2, 3))
    assert got[1]["mse"] == 0.0  # endpoints reconstruct exactly
    assert got[2]["mse"] == 0.0
    del emb


def test_temperature_mixture_tau1_identity(spark):
    from etielle_spark.operators.clusters import temperature_mixture

    df = spark.createDataFrame(
        [(i, "a" if i < 8 else "b") for i in range(12)], "id long, g string"
    )
    out = temperature_mixture(df, "id", "g", tau=1.0)
    rows = out.collect()
    # tau=1, default budget: weight == 1 for every group -> exactly one copy
    assert len(rows) == 12
    assert all(r["copy_idx"] == 0 and r["weight"] == 1.0 for r in rows)


def test_temperature_mixture_boosts_small_group(spark):
    from etielle_spark.operators.clusters import temperature_mixture

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)], "id long, g string"
    )
    out = temperature_mixture(df, "id", "g", tau=0.0)
    w = {r["g"]: r["weight"] for r in out.select("g", "weight").distinct().collect()}
    # tau=0: equal target shares -> small group up-weighted, big down
    assert w["small"] > 1.0 > w["big"]
    assert math.isclose(w["small"], 50 / 10, rel_tol=1e-6)
    assert math.isclose(w["big"], 50 / 90, rel_tol=1e-6)


def test_temperature_mixture_budget_scales_output(spark):
    from etielle_spark.operators.clusters import temperature_mixture

    df = spark.createDataFrame([(i, "a") for i in range(20)], "id long, g string")
    out = temperature_mixture(df, "id", "g", tau=1.0, budget=60)
    assert out.count() == 60  # weight exactly 3.0 -> 3 copies each
    assert out.agg(F.max("copy_idx")).collect()[0][0] == 2


def test_densify_counts_probe_and_normalize(spark):
    from etielle_spark.operators.text import densify_counts

    feats = spark.createDataFrame(
        [(1, 0, 2), (1, 3, 6), (2, 1, 5)], "id long, bucket long, n long"
    )
    out = {r["id"]: r["x"] for r in densify_counts(
        feats, "id", "bucket", "n", n_buckets=4
    ).collect()}
    assert out[1] == [0.25, 0.0, 0.0, 0.75]
    assert out[2] == [0.0, 1.0, 0.0, 0.0]
    raw = {r["id"]: r["x"] for r in densify_counts(
        feats, "id", "bucket", "n", n_buckets=4, normalize=False
    ).collect()}
    assert raw[1] == [2.0, 0.0, 0.0, 6.0]


def test_logreg_train_matches_numpy_gd(spark):
    from etielle_spark.operators.text import logreg_train

    rng = np.random.RandomState(11)
    X = rng.rand(60, 5)
    yv = (X[:, 0] + X[:, 1] > 1.0).astype(float)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], float(yv[i])) for i in range(60)],
        "id long, x array<double>, y double",
    )
    w, b = logreg_train(df, "id", "x", "y", lr=0.5, n_steps=3)
    # numpy replay with the same rounding discipline
    wn, bn = np.zeros(5), 0.0
    for _ in range(3):
        z = np.round(bn + X @ wn, 9)
        r = 1.0 / (1.0 + np.exp(-z)) - yv
        g = (X * r[:, None]).sum(axis=0) / len(yv)
        wn = np.sign(wn - 0.5 * g) * np.floor(np.abs(wn - 0.5 * g) * 1e9 + 0.5) / 1e9
        bu = bn - 0.5 * r.sum() / len(yv)
        bn = math.copysign(math.floor(abs(bu) * 1e9 + 0.5) / 1e9, bu)
    assert np.allclose(w, wn, atol=1e-9)
    assert math.isclose(b, bn, abs_tol=1e-9)


def test_logreg_train_then_score_separates(spark):
    from etielle_spark.operators.text import logreg_score, logreg_train

    rows = [(i, [1.0, 0.0], 1.0) for i in range(20)] + [
        (100 + i, [0.0, 1.0], 0.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, x array<double>, y double")
    w, b = logreg_train(df, "id", "x", "y", lr=2.0, n_steps=20)
    assert w[0] > 0 > w[1]
    scores = {r["id"]: r["score"] for r in logreg_score(df, "id", "x", w, b).collect()}
    assert all(scores[i] > 0.5 for i in range(20))
    assert all(scores[100 + i] < 0.5 for i in range(20))


def test_binary_metrics_known_values(spark):
    from etielle_spark.operators.profile import binary_metrics

    # scores: pos at .9/.8/.4, neg at .7/.3/.1 -> pairs won 8/9, 0 ties
    df = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.4, 1.0), (0.7, 0.0), (0.3, 0.0), (0.1, 0.0)],
        "score double, y double",
    )
    r = binary_metrics(df, "score", "y").collect()[0]
    assert r["n"] == 6 and r["n_pos"] == 3
    assert math.isclose(r["auc"], 8 / 9, abs_tol=1e-6)
    # threshold .5: tp=2 fp=1 fn=1 tn=2
    assert math.isclose(r["accuracy"], 4 / 6, abs_tol=1e-6)
    assert math.isclose(r["precision"], 2 / 3, abs_tol=1e-6)
    assert math.isclose(r["recall"], 2 / 3, abs_tol=1e-6)
    assert math.isclose(r["f1"], 2 / 3, abs_tol=1e-6)


def test_binary_metrics_ties_and_degenerate(spark):
    from etielle_spark.operators.profile import binary_metrics

    # all scores equal: AUC = 0.5 exactly via tie correction
    df = spark.createDataFrame(
        [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0), (0.5, 0.0)], "score double, y double"
    )
    assert binary_metrics(df, "score", "y").collect()[0]["auc"] == 0.5
    # single class: AUC NULL; tp=1 fn=1 -> recall .5, precision 1
    one = spark.createDataFrame([(0.9, 1.0), (0.2, 1.0)], "score double, y double")
    r = binary_metrics(one, "score", "y").collect()[0]
    assert r["auc"] is None and r["recall"] == 0.5 and r["precision"] == 1.0


def test_silhouette_centroid_separated_blobs(spark):
    from etielle_spark.operators.similarity import silhouette_centroid

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    emb = spark.createDataFrame(
        [(1, [5.0, 0.1]), (2, [0.1, 7.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in silhouette_centroid(
        emb, "vec_id", "embedding", cents
    ).collect()}
    assert out[1]["cell"] == 0 and out[1]["silhouette"] > 0.9
    assert out[2]["cell"] == 1 and out[2]["silhouette"] > 0.9
    # equidistant point: cell = smaller id tie-break, silhouette 0
    assert out[3]["cell"] == 0 and out[3]["silhouette"] == 0.0


def test_mmr_select_prefers_diverse_second_pick(spark):
    from etielle_spark.operators.similarity import mmr_select

    # id 1: best score; id 2: near-duplicate of 1 with 2nd-best score;
    # id 3: orthogonal with lower score -> MMR must pick 3 over 2
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1.0),
            (2, [0.999, 0.04], 0.9),
            (3, [0.0, 1.0], 0.5),
        ],
        "vec_id long, embedding array<double>, rel double",
    )
    out = mmr_select(emb, "vec_id", "embedding", "rel", k=2, lam=0.5).collect()
    picks = {r["rank"]: r["id"] for r in out}
    assert picks == {0: 1, 1: 3}


def test_mmr_select_bucket_cap_raises(spark):
    import pytest as _pytest

    from etielle_spark.operators.similarity import mmr_select

    emb = spark.createDataFrame(
        [(i, [1.0, float(i)], 1.0) for i in range(5)],
        "vec_id long, embedding array<double>, rel double",
    )
    with _pytest.raises(Exception, match="max_bucket"):
        mmr_select(
            emb, "vec_id", "embedding", "rel", k=2, max_bucket=3
        ).collect()


def test_interpolated_nll_hand_computed(spark):
    from etielle_spark.operators.text import interpolated_nll

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "x")], "id long, text string"
    )
    out = {r["id"]: r for r in interpolated_nll(
        df, "id", "text", lam=0.5
    ).collect()}
    # bigrams: "a b" x2, "b a" x1; ctx a->2 b->1; uni a:3 b:2 x:1 T=6
    p_ab = 0.5 * 2 / 2 + 0.5 * 2 / 6
    p_ba = 0.5 * 1 / 1 + 0.5 * 3 / 6
    assert out[1]["n_bigrams"] == 2
    assert math.isclose(
        out[1]["nll"], -(math.log(p_ab) + math.log(p_ba)) / 2, abs_tol=1e-6
    )
    assert math.isclose(out[2]["nll"], -math.log(p_ab), abs_tol=1e-6)
    assert 3 not in out  # single-token doc has no bigrams


def test_interpolated_nll_lam1_equals_bigram(spark):
    from etielle_spark.operators.text import bigram_nll, interpolated_nll

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran")], "id long, text string"
    )
    a = {(r["id"], r["n_bigrams"], r["nll"])
         for r in interpolated_nll(df, "id", "text", lam=1.0).collect()}
    b = {(r["id"], r["n_bigrams"], r["nll"])
         for r in bigram_nll(df, "id", "text").collect()}
    assert a == b


def test_normalize_text_levels(spark):
    from etielle_spark.operators.dedup import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello,   World! v1.2.3  ")], "id long, t string"
    )
    got = df.select(
        normalize_text(F.col("t"), level="basic").alias("b"),
        normalize_text(F.col("t"), level="punct").alias("p"),
        normalize_text(F.col("t"), level="aggressive").alias("a"),
    ).collect()[0]
    assert got["b"] == "hello, world! v1.2.3"
    assert got["p"] == "hello world v1 2 3"
    assert got["a"] == "hello world v0 0 0"


def test_normalize_text_collapses_noisy_clone(spark):
    from etielle_spark.operators.dedup import normalize_text

    df = spark.createDataFrame(
        [(1, "The cat sat."), (2, "THE CAT SAT!!!")], "id long, t string"
    )
    out = df.select(normalize_text(F.col("t"), level="punct").alias("n")).collect()
    assert out[0]["n"] == out[1]["n"] == "the cat sat"


def test_cluster_dedup_keep_by_prefers_best(spark):
    from etielle_spark.operators.dedup import cluster_dedup

    # three near-identical docs; quality says id 3 (longest) should win
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta!"),
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (9, "completely different words nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in cluster_dedup(
        df, "doc_id", "text", keep_by=F.length("text")
    ).collect()}
    cluster = {out[i]["component"] for i in (1, 2, 3)}
    assert len(cluster) == 1  # 1,2,3 form one component
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, False, True]
    assert out[9]["keep"] is True  # singleton keeps itself
    # default policy still keeps the min id
    out2 = {r["id"]: r["keep"] for r in cluster_dedup(
        df, "doc_id", "text"
    ).collect()}
    assert out2[1] is True and out2[3] is False


def test_ridge_fit_matches_numpy(spark):
    from etielle_spark.operators.similarity import ridge_fit

    rng = np.random.RandomState(5)
    X = rng.randn(80, 3)
    yv = 2.0 * X[:, 0] - 1.5 * X[:, 1] + 0.5 * X[:, 2] + 3.0
    df = spark.createDataFrame(
        [([float(v) for v in X[i]], float(yv[i])) for i in range(80)],
        "x array<double>, y double",
    )
    w, b = ridge_fit(df, "x", "y", l2=0.0, fit_intercept=True)
    # exact linear relation, no noise, no regularization -> recover it
    assert np.allclose(w, [2.0, -1.5, 0.5], atol=1e-6)
    assert math.isclose(b, 3.0, abs_tol=1e-6)


def test_ridge_fit_l2_shrinks_and_no_intercept(spark):
    from etielle_spark.operators.similarity import ridge_fit

    rng = np.random.RandomState(6)
    X = rng.randn(60, 2)
    yv = X[:, 0] + X[:, 1]
    df = spark.createDataFrame(
        [([float(v) for v in X[i]], float(yv[i])) for i in range(60)],
        "x array<double>, y double",
    )
    w0, _ = ridge_fit(df, "x", "y", l2=0.0)
    w1, _ = ridge_fit(df, "x", "y", l2=1.0)
    assert abs(w1[0]) < abs(w0[0]) and abs(w1[1]) < abs(w0[1])
    wn, bn = ridge_fit(df, "x", "y", l2=0.0, fit_intercept=False)
    # numpy replay of the uncentered normal equations
    want = np.linalg.solve(X.T @ X / len(X), X.T @ yv / len(X))
    assert np.allclose(wn, want, atol=1e-6) and bn == 0.0


def test_bootstrap_mean_ci_brackets_mean(spark):
    from etielle_spark.operators.profile import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, float(100 + (i % 7))) for i in range(200)], "id long, v double"
    )
    r = bootstrap_mean_ci(df, "id", "v", n_boot=40).collect()[0]
    assert r["n"] == 200 and r["n_boot"] == 40
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # values span [100, 106]; a mean CI must stay well inside
    assert 100.0 < r["ci_lo"] and r["ci_hi"] < 106.0
    # narrow spread: CI width far below the value range
    assert r["ci_hi"] - r["ci_lo"] < 2.0


def test_bootstrap_mean_ci_deterministic(spark):
    from etielle_spark.operators.profile import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    )
    a = bootstrap_mean_ci(df, "id", "v", n_boot=20).collect()[0]
    b = bootstrap_mean_ci(df, "id", "v", n_boot=20).collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) == (b["ci_lo"], b["ci_hi"])


def test_null_robustness_round3_ops(spark):
    """Null vectors/labels are excluded, not crashes or silent miscounts."""
    from etielle_spark.operators.profile import binary_metrics
    from etielle_spark.operators.similarity import gram_matrix, quantize_int8
    from etielle_spark.operators.text import logreg_train

    emb = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    for engine in ("sql", "arrow"):
        assert gram_matrix(
            emb, "vec_id", "embedding", engine=engine
        ).count() == 3  # 2x2 upper triangle; null row dropped
    assert quantize_int8(emb, "vec_id", "embedding").count() == 2

    lab = spark.createDataFrame(
        [(1, [1.0], 1.0), (2, None, 0.0), (3, [0.0], None), (4, [0.0], 0.0)],
        "id long, x array<double>, y double",
    )
    w, b = logreg_train(lab, "id", "x", "y", n_steps=1)
    assert len(w) == 1  # trained on the 2 complete rows only

    m = spark.createDataFrame(
        [(0.9, 1.0), (None, 0.0), (0.1, None), (0.2, 0.0)],
        "score double, y double",
    )
    r = binary_metrics(m, "score", "y").collect()[0]
    assert r["n"] == 2 and r["auc"] == 1.0


def test_quantize_int8_reconstruct_column(spark):
    from etielle_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, [1.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in quantize_int8(
        emb, "vec_id", "embedding", reconstruct=True
    ).collect()}
    # endpoints reconstruct exactly
    assert out[1]["recon"] == [0.0, 2.0]
    assert out[2]["recon"] == [1.0, 4.0]
    # default output has no recon column
    assert "recon" not in quantize_int8(emb, "vec_id", "embedding").columns


def test_pca_fit_return_means(spark):
    from etielle_spark.operators.similarity import pca_fit, pca_project

    emb = _emb_df(spark, n=30, d=3, seed=9)
    comps, means = pca_fit(emb, "vec_id", "embedding", k=1, return_means=True)
    mat = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    assert np.allclose(means, mat.mean(axis=0), atol=1e-9)
    # centered scores sum to ~0 across the corpus (true principal scores)
    scores = [
        r["score"]
        for r in pca_project(
            emb, "vec_id", "embedding", comps, center_means=means
        ).collect()
    ]
    assert abs(sum(scores)) < 1e-3
