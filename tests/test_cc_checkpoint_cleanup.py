"""The CC loop's reliable-checkpoint hygiene: superseded rounds'
checkpoint files are deleted inside the loop, so the checkpoint dir
holds O(1) round files after convergence instead of one per round."""

import os

from pyspark.sql import functions as F


def _rdd_ckpt_dirs(root):
    out = []
    for dirpath, dirnames, _ in os.walk(root):
        out.extend(d for d in dirnames if d.startswith("rdd-"))
    return out


def test_cc_reliable_checkpoints_are_cleaned_in_loop(spark, tmp_path):
    from etielle_spark.operators.graph import connected_components_df

    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        # a 40-node path graph forces multiple pointer-jump rounds
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(40)], "id_a long, id_b long"
        )
        labels = connected_components_df(edges, "id_a", "id_b")
        rows = labels.collect()
        assert len(rows) == 41
        assert {r["component"] for r in rows} == {0}

        kept = _rdd_ckpt_dirs(ckpt)
        # only the CONVERGED round's files may remain (the returned
        # frame reads them); every superseded round must be gone
        assert len(kept) <= 1, f"leaked checkpoint rounds: {kept}"
        # and the returned frame still computes off the kept round
        assert labels.count() == 41
    finally:
        # session-scoped fixture: restore the no-checkpoint-dir default
        # so other tests keep exercising the localCheckpoint path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )
