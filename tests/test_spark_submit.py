"""The north rule's deployment surface, run for real: ``spark-submit
--py-files omop_meds_spark.zip`` replays a WAL into the snapshot table in a
separate spark-submit-launched JVM/driver. The zipimport half of this
contract is pinned Spark-free in test_cli.py; this test exercises the
actual launcher binary end-to-end and is skipped where no Spark
distribution is installed."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

_CANDIDATES = ["/opt/spark/bin/spark-submit", shutil.which("spark-submit") or ""]
SPARK_SUBMIT = next((c for c in _CANDIDATES if c and Path(c).exists()), "")


@pytest.mark.skipif(not SPARK_SUBMIT, reason="no spark-submit binary")
def test_spark_submit_pyfiles_replay(tmpdir_path):
    from omop_meds_spark.sources.gen import generate_wal

    work = Path(tmpdir_path)
    generate_wal(work / "wal", n_events=8000, n_repos=10, paths_per_repo=40,
                 n_files=6, seed=7)

    repo = Path(__file__).resolve().parent.parent
    zpath = work / "omop_meds_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in sorted((repo / "omop_meds_spark").rglob("*")):
            if f.suffix in (".py", ".yaml"):
                z.write(f, f.relative_to(repo))
    driver = work / "submit_replay.py"
    driver.write_text(
        "import sys\n"
        "from omop_meds_spark.__main__ import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zpath), str(driver),
         "replay", "--wal", str(work / "wal"), "--table", str(work / "tbl"),
         "--buckets", "8", "--files-per-batch", "3"],
        capture_output=True, text=True, timeout=300,
        # inherit the environment (JAVA_HOME, PYSPARK_PYTHON, ...) but
        # strip PYTHONPATH so the package can ONLY come from the zip
        env={k: v for k, v in _env().items() if k != "PYTHONPATH"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # the submitted driver committed a real snapshot log: verify from THIS
    # process without Spark — manifests are plain JSON
    logs = sorted((work / "tbl" / "_log").glob("v*-*.json"))
    assert logs, "no manifests committed"
    state = json.loads(logs[0].read_text())
    for p in logs[1:]:
        from omop_meds_spark.table import _apply_delta

        d = json.loads(p.read_text())
        state = d if d.get("kind") == "ckpt" else _apply_delta(state, d)
    assert state["committed_hwm"] == 1  # 6 files / 3 per batch = 2 batches
    assert state["watermark_seq"] == 7999
    n_files = sum(len(fs) for fs in state["files"].values())
    assert n_files > 0
    for fs in state["files"].values():
        for f in fs:
            assert (work / "tbl" / f).exists()


def _env() -> dict:
    import os

    return dict(os.environ)
