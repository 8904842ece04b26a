"""Kill-and-resume integration test (north rule: 'a killed job resumes from
the last completed stage'): run the spark-submit entrypoint, kill it mid-run,
rerun, and verify the result equals an uninterrupted run — the reference's
path-equivalence pattern (integration_test.rs:246-295) applied to resume."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(workdir: str, timeout_kill: float | None = None):
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--fixture",
        "80",
        "--workdir",
        workdir,
        "--cpus",
        "4",
    ]
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True
    )
    if timeout_kill is not None:
        time.sleep(timeout_kill)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
        return None
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out
    return json.loads(out.strip().splitlines()[-1])


@pytest.mark.slow
class TestKillResume:
    def test_killed_job_resumes_and_matches_fresh(self, tmp_path):
        killed_dir = str(tmp_path / "killed")
        fresh_dir = str(tmp_path / "fresh")
        # kill mid-run (after sketch stage likely started/committed)
        _run(killed_dir, timeout_kill=30.0)
        # resume: must complete, reusing any committed stages
        resumed = _run(killed_dir)
        fresh = _run(fresh_dir)
        assert resumed["images_in"] == fresh["images_in"]
        assert resumed["survivors"] == fresh["survivors"]
        assert resumed["stages"] == fresh["stages"]
        assert resumed["config_hash"] == fresh["config_hash"]
