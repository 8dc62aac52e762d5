"""Round-11 optimization pins: the CC loop's adaptive-partition/
double-jump gate is label-identical to the r10 form and restores the
session shuffle-partition conf; derived_stream_partitions clamps to
[4, session default]."""

import os

import pytest


@pytest.fixture
def cc_mode():
    old = os.environ.get("ETIELLE_CC_LOOP")
    yield
    if old is None:
        os.environ.pop("ETIELLE_CC_LOOP", None)
    else:
        os.environ["ETIELLE_CC_LOOP"] = old


def _labels(spark, edges):
    from etielle_spark.operators.graph import connected_components_df

    return sorted(
        (r["id"], r["component"])
        for r in connected_components_df(edges, "id_a", "id_b").collect()
    )


def test_cc_fast_mode_is_label_identical_and_restores_conf(spark, cc_mode):
    # a path graph (multi-round convergence) plus a disjoint triangle
    # and a singleton self-loop-free pair
    rows = [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102), (102, 100)]
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    before = spark.conf.get("spark.sql.shuffle.partitions")

    os.environ["ETIELLE_CC_LOOP"] = "base"
    base = _labels(spark, edges)
    # every gate value (the shipped default "parts", plus the
    # refuted-but-reproducible "jump2"/"fast") must be label-identical
    for mode in ("parts", "jump2", "fast"):
        os.environ["ETIELLE_CC_LOOP"] = mode
        assert _labels(spark, edges) == base, mode
    assert {c for _, c in base} == {0, 100}
    # the loop's reduced shuffle-partition conf must not leak out
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_cc_conf_restored_on_nonconvergence_error(spark, cc_mode):
    from etielle_spark.operators.graph import connected_components_df

    os.environ["ETIELLE_CC_LOOP"] = "parts"
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components_df(edges, "id_a", "id_b", max_iter=1)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_derived_stream_partitions_clamps(spark):
    from etielle_spark.streaming.windows import derived_stream_partitions

    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert derived_stream_partitions(spark, 1) == min(cur, 4)
    assert derived_stream_partitions(spark, 10_000_000) == cur
    # ceil(125k / 50k) = 3 -> floor of 4 applies
    assert derived_stream_partitions(spark, 125_000) == min(cur, 4)
    assert derived_stream_partitions(spark, 250_000, rows_per_task=50_000) == min(
        cur, 5
    )
