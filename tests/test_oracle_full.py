"""CI gate over the FULL oracle set.

The driver's CORRECTNESS check only samples the first 50 ``queries()``
entries — this test keeps the WHOLE registry (168 queries as of r6)
hash-gated regardless of registry order by running the same
Spark-vs-DuckDB compare the driver uses (tools/verify_oracle.py) over
the full set at sf0.01.

Marked ``slow`` (~3 min, own JVM): deselect with ``-m "not slow"`` when
iterating; the default run includes it.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_all_declared_queries_match_oracles():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_oracle.py"),
         "/root/testdata/sf0.01"],
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "16")},
        capture_output=True,
        text=True,
        timeout=1200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"verify_oracle failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 fail" in proc.stdout, tail
