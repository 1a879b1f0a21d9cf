"""Env-gated full oracle sweep at a chosen scale factor.

The driver's correctness gate runs at sf0.01; scale-dependent
divergences (rounding, overflow, adaptive driver-fold/shuffle path
switches) only show at sf0.1.  ``GRAFT_ORACLE_SWEEP_SF=/root/testdata/sf0.1
pytest tests/test_oracle_sweep.py`` machine-checks every queries()
entry against its DuckDB oracle at that scale in a fresh subprocess
(its own Ray session sized for the sweep, independent of the 4-cpu
session fixture).  Skipped in the default suite — the sf0.1 sweep
takes minutes.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.environ.get("GRAFT_ORACLE_SWEEP_SF"),
    reason="set GRAFT_ORACLE_SWEEP_SF=<sf_dir> to run the full sweep",
)
def test_oracle_sweep_at_sf():
    sf_dir = os.environ["GRAFT_ORACLE_SWEEP_SF"]
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
        env={k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"},
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-60:])
    assert proc.returncode == 0, f"oracle sweep failed at {sf_dir}:\n{tail}"
