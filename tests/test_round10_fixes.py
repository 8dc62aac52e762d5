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


def test_ship_package_idempotent(spark):
    """Second call for the same application is a no-op (set lookup), and
    the zip is content-addressed under the system tempdir."""
    from etielle_spark import session as sess

    sess._SHIPPED_APPS.discard(spark.sparkContext.applicationId)
    first = sess.ship_package(spark)
    assert first is not None and first.endswith(".zip") and Path(first).exists()
    assert sess.ship_package(spark) is None
    # deterministic: rebuilding the archive for unchanged sources reuses it
    pkg_dir = Path(sess.__file__).resolve().parent
    assert str(sess._package_zip(pkg_dir)) == first
