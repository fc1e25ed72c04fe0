"""Multi-host (2-process) sharded train step == single-process (SURVEY §2.8).

Runs scripts/multihost_dryrun.py: two OS processes x 4 virtual CPU devices
joined by jax.distributed (gloo CPU collectives) execute the full sharded
train step + densify/reshard event, and the losses must match the
single-process 8-device run.  The reference has no distributed layer at all;
this is the DCN leg of the north star's scaling row (BASELINE.md).
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_two_process_matches_single_process():
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "multihost_dryrun.py"),
         "--n", "4000", "--size", "192", "--timeout", "1500"],
        capture_output=True, text=True, cwd=ROOT, timeout=1800)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    for key, chk in result["checks"].items():
        assert chk["rel_spread"] < 1e-5, (key, chk)
