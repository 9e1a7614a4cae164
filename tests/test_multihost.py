"""Multi-host scale-out dryrun: 2 jax.distributed processes, gloo CPU
collectives, 8-device global mesh (see tools/multihost_dryrun.py)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "..", "tools", "multihost_dryrun.py")


def test_multihost_dryrun():
    # clean env: the orchestrator's workers set their own JAX platform
    r = subprocess.run([sys.executable, TOOL], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["ok"] is True
    assert summary["hosts"] == 2
    assert summary["recalls"] == [1.0, 1.0]
