"""Cluster-submission packaging: the ``spark-submit --py-files`` path.

The north rule requires the job to ship via ``spark-submit --py-files`` to a
multi-executor cluster. This test exercises the REAL submission path end to
end in the sandbox: build the deterministic package zip, then launch a
separate ``spark-submit`` driver process from OUTSIDE the repo tree (so the
engine can only be imported from the zip) and run the full pipeline on the
tiny fixture.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    d1 = make_pyfiles.build(str(tmp_path / "a.zip"))
    d2 = make_pyfiles.build(str(tmp_path / "b.zip"))
    assert d1 == d2
    assert (tmp_path / "a.zip").read_bytes() == (tmp_path / "b.zip").read_bytes()


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    # input: the deterministic tiny fixture, written by THIS session
    from translink import fixtures

    d = fixtures.generate("tiny", seed=42)
    inp = str(tmp_path / "transcripts.parquet")
    fixtures.to_spark(spark, d["transcripts"]).write.parquet(inp)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "translink.zip")
    make_pyfiles.build(zip_path)
    # the primary file must live outside the repo too — prove nothing is
    # imported from the working tree
    primary = str(tmp_path / "submit_job.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_job.py"), primary)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # engine must come from --py-files only
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    out_report = str(tmp_path / "report.json")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            primary,
            "--input", inp,
            "--workdir", str(tmp_path / "work"),
            "--output", out_report,
            "--format", "json",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["n_records"] > 0 and stats["n_clusters"] > 0
    assert stats["n_duplicates"] > 0  # the tiny fixture plants duplicates
    # json format is a distributed writer: a directory of part files with
    # one member row per line
    parts = [p for p in os.listdir(out_report) if p.startswith("part-")]
    assert parts
    rows = []
    for p in parts:
        with open(os.path.join(out_report, p)) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    assert rows and all("cluster_id" in r for r in rows)
