"""spark-submit surface for the medlit Pass-2 merge job
(jobs/run_medlit_pass2.py): package via --py-files to a fresh driver (no
repo on sys.path), real reference corpus in, parquet tables out, counts
matching the in-process parity run (1,688 entities / 1,270 triples /
2,065 id_map rows — tests/test_medlit_parity.py)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
BUNDLES = "/root/reference/pass1_bundles"
CACHE = "/root/reference/pass1_vocab/seeded_synonym_cache.json"

pytestmark = pytest.mark.skipif(
    not Path(BUNDLES).exists(), reason="reference corpus not mounted"
)


def _spark_submit() -> str | None:
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    return shutil.which("spark-submit")


def test_spark_submit_medlit_pass2(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this box")

    zip_path = tmp_path / "kgraph_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted((REPO / "kgraph_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    workdir = tmp_path / "merged"
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": str(tmp_path),
        "JAVA_HOME": os.environ.get("JAVA_HOME", ""),
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
        "SPARK_LOCAL_DIRS": str(tmp_path / "scratch"),
    }
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            "--conf", "spark.driver.memory=4g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            str(REPO / "jobs" / "run_medlit_pass2.py"),
            "--bundles", BUNDLES,
            "--synonym-cache", CACHE,
            "--workdir", str(workdir),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    rec = json.loads(lines[-1])
    # the in-process parity run's counts (test_medlit_parity.py)
    assert rec["entities"] == 1688
    assert rec["triples"] == 1270
    assert rec["id_map"] == 2065
    for name in ("entities", "triples", "id_map"):
        assert (workdir / name).exists()
