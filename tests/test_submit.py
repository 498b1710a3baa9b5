"""The north-rule launch shape, literally: ``spark-submit --py-files``.

The engine must be deployable as a zip handed to spark-submit — no
install, no PYTHONPATH, no cwd assumptions.  This test builds the zip,
writes a driver script that imports the package ONLY from the zip,
runs a miniature seed + CDC apply + oracle check inside the submitted
job, and asserts the subprocess proves it (marker + exit 0).

On a real cluster the only change is ``--master``; everything the job
needs travels in the one zip (executors get it via spark-submit's
file distribution, the driver via its sys.path injection).
"""

import os
import subprocess
import sys
import textwrap

import pyspark

from giraffe_etl_spark.session import build_pyfiles_zip

JOB = textwrap.dedent(
    """
    import sys
    assert any(p.endswith(".zip") for p in sys.path), "package must come from --py-files"
    import giraffe_etl_spark
    assert ".zip" in giraffe_etl_spark.__file__, giraffe_etl_spark.__file__

    from pyspark.sql import SparkSession

    # master comes from spark-submit, not the code
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from giraffe_etl_spark.cdc import (
        CdcApplier, ChangeGenConfig, gen_changes, gen_pages,
        oracle_apply, read_pages, seed_pages,
    )

    root = sys.argv[1]
    cfg = ChangeGenConfig(n_keys=25, seed=7)
    applier = CdcApplier(spark, root, n_buckets=4)
    seed_pages(applier.pages, spark.createDataFrame(gen_pages(25, seed=7)))
    changes = gen_changes(120, cfg)
    applier.apply_batch(
        spark.createDataFrame(
            changes, "lsn long, op string, url string, warc_ts timestamp, html binary"
        ),
        batch_id=0,
    )
    got = read_pages(applier.pages).toPandas().sort_values("url").reset_index(drop=True)
    want = oracle_apply(gen_pages(25, seed=7), changes)
    want = want.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"]), "url set diverged from oracle"
    assert list(got["text"]) == list(want["text"]), "text diverged from oracle"
    print("SUBMIT_OK rows=%d" % len(got))
    spark.stop()
    """
)


def test_spark_submit_py_files_end_to_end(tmp_path):
    zpath = build_pyfiles_zip(str(tmp_path / "engine.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")

    env = dict(os.environ)
    # the job must NOT see the repo via inherited interpreter paths
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            str(job),
            str(tmp_path / "table_root"),
        ],
        cwd=str(tmp_path),  # neutral cwd: no accidental repo imports
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "SUBMIT_OK rows=" in proc.stdout, proc.stdout[-2000:]
