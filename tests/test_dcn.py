"""Two-process DCN dryrun (VERDICT r3 #4): `initialize_distributed()` must
actually work, not just be wired.

Spawns 2 CPU processes x 4 virtual devices via scripts/dcn_dryrun.py and
asserts both workers run the joint-mesh train step + SP decode. ~2 min —
the only test that exercises jax.distributed / cross-process collectives.
"""

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_two_process_dcn_dryrun():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dcn_dryrun.py"),
         "--launch"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert out.stdout.count("DCN DRYRUN OK") == 2, out.stdout[-3000:]
