"""CLI entry point (reference §3.1 parity): ingest -> table -> SQL ->
preview/persist, driven as a real subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args: list[str], tmp_path) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "data_engineering_zoomcamp_my_test_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=300,
    )


def test_cli_ingest_query_out(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,x\n2,y\n3,x\n")
    out = tmp_path / "result"
    proc = _run_cli(
        [
            "--source", str(src),
            "--table", "t_cli",
            "--sql", "SELECT b, COUNT(*) AS n FROM t_cli GROUP BY b ORDER BY b",
            "--out", str(out),
            "--master", "local[2]",
        ],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "table t_cli: written" in proc.stdout
    assert "result written to" in proc.stdout

    import duckdb

    rows = duckdb.sql(f"SELECT * FROM '{out}/*.parquet' ORDER BY b").fetchall()
    assert rows == [("x", 2), ("y", 1)]


def test_cli_default_count_query(tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("a\n1\n2\n")
    proc = _run_cli(
        ["--source", str(src), "--table", "t_def", "--master", "local[2]"],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "n_rows" in proc.stdout


def test_cli_missing_source_fails(tmp_path):
    proc = _run_cli(
        ["--source", str(tmp_path / "nope.csv"), "--master", "local[2]"],
        tmp_path,
    )
    assert proc.returncode != 0
