"""Full-registry oracle sweep at two scale factors.

Deselected by default (see conftest): `pytest -m oracles` runs every
queries() entry against its DuckDB oracle_sql() at sf0.001 AND
sf0.01 via tools/check_oracles.py — the same comparison the driver's
correctness gate performs, enforced in-repo so a broken oracle (like
round 5's hard-coded memory_report path) can't hide behind a single
scale factor.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.oracles
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_full_oracle_sweep(sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, f"oracle sweep failed at {sf_dir}:\n{tail}\n{proc.stderr[-2000:]}"


@pytest.mark.oracles_sf01
def test_full_oracle_sweep_sf01():
    """Round-close sf0.1 sweep: same comparison as the driver gate at
    the largest local scale, recording ORACLE_SWEEP_SF01.json at the
    repo root so "tri-scale green" is a committed artifact, not a
    session claim."""
    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    env = dict(os.environ, ORACLE_SWEEP_OUT=os.path.join(REPO, "ORACLE_SWEEP_SF01.json"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"), sf_dir],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=5400,
        env=env,
    )
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, f"oracle sweep failed at {sf_dir}:\n{tail}\n{proc.stderr[-2000:]}"
