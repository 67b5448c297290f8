"""End-to-end test for the `ray job submit` entrypoint (tools/job_entry.py):
standalone fallback, partitioned output, and shard-level resume."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir, *extra):
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "job_entry.py"),
            "--pipeline", "extract", "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir, "--n-shards", "4", "--local-cpus", "4",
            *extra,
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_job_entry_extract_and_resume(tmp_path):
    out = str(tmp_path / "job_out")
    m1 = _run(out)
    assert m1["rows_written"] == 500
    assert sorted(m1["shards_written"]) == [0, 1, 2, 3]
    for k in range(4):
        assert os.path.exists(os.path.join(out, f"shard={k}", "_SUCCESS"))
    # resubmission skips every finished shard (per-partition lineage)
    m2 = _run(out)
    assert m2["rows_written"] == 0
    assert sorted(m2["shards_skipped"]) == [0, 1, 2, 3]
