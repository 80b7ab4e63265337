"""End-to-end evidence for the spark-submit --py-files pillar:
the zip build, import-from-zip (what --py-files actually does on an
executor), and the cluster entry point driven as a real subprocess
(its own JVM, like spark-submit client mode)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_builds_and_imports_standalone():
    from make_pyfiles import build
    path = build()
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    pkg = "standard_data_quality_framework_spark"
    assert f"{pkg}/__init__.py" in names
    assert f"{pkg}/pipeline.py" in names
    assert f"{pkg}/operators/dedup.py" in names
    assert not any("__pycache__" in n for n in names)
    # import the package FROM THE ZIP in a clean interpreter — the
    # exact mechanism --py-files relies on (zipimport on sys.path)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        f"import {pkg}.pipeline as p; "
        f"import {pkg}.operators.sampling as s; "
        "print('zip-import-ok', p.__file__.split('.zip')[0][-1:] "
        "if '.zip' in p.__file__ else 'NOT-FROM-ZIP')"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", probe, path], env=env, cwd="/",
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "zip-import-ok" in out.stdout
    assert "NOT-FROM-ZIP" not in out.stdout


def test_spark_submit_main_local_smoke():
    # the documented local-smoke invocation, as its own process/JVM
    from standard_data_quality_framework_spark.fixtures import (
        write_pages_parquet)
    tmp = tempfile.mkdtemp()
    pages = os.path.join(tmp, "pages.parquet")
    wh = os.path.join(tmp, "wh")
    write_pages_parquet(pages, n=300, seed=7)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "spark_submit_main.py"),
         "--input", pages, "--warehouse", wh, "--cores", "4",
         "--run-id", "smoke1"],
        cwd=REPO, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary.get("rows_in") == 300, summary
    obs = summary["observed"]
    assert obs["docs_scanned"] == 300, summary
    assert 0 < obs["docs_kept"] < 300, summary
    # warehouse artifacts exist and are readable parquet
    import duckdb
    n = duckdb.sql(
        f"select count(*) from '{wh}/pages_filtered/**/*.parquet'"
    ).fetchone()[0]
    assert n == obs["docs_kept"]
