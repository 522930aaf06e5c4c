"""Session-scoped ephemeral dirs (ADVICE r8): c66/c78/c80's lazily-read
streaming sink dirs must not accumulate unbounded /tmp state across
repeated parity sweeps / fuzz campaigns."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ephemeral_dirs_live_for_the_session_then_vanish(tmp_path):
    # a finished process's pid = a guaranteed-dead owner for the stale dir
    probe = subprocess.Popen([sys.executable, "-c", "pass"])
    probe.wait()
    stale = tmp_path / f"spark_graft_eph_{probe.pid}"
    stale.mkdir()
    (stale / "leftover").write_text("x")
    # non-pid-named siblings must be left alone
    bystander = tmp_path / "spark_graft_eph_notapid"
    bystander.mkdir()

    env = {**os.environ, "TMPDIR": str(tmp_path)}
    code = (
        "import os\n"
        "from data_engineering_zoomcamp_my_test_spark.tmpdirs import ephemeral_dir\n"
        "a = ephemeral_dir('t_')\n"
        "b = ephemeral_dir('t_')\n"
        "assert os.path.isdir(a) and os.path.isdir(b) and a != b\n"
        "assert os.path.dirname(a) == os.path.dirname(b)\n"
        "assert os.path.basename(os.path.dirname(a)) == "
        f"'spark_graft_eph_' + str(os.getpid())\n"
        "print(a)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    created = out.stdout.strip()
    assert created.startswith(str(tmp_path))
    # atexit reclaimed the whole per-process parent
    assert not os.path.exists(os.path.dirname(created))
    # the dead-owner parent was swept on first use; bystander untouched
    assert not stale.exists()
    assert bystander.exists()
