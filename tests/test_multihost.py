"""Cross-process pipeline execution (tools/multihost_dryrun.py).

Runs the 2-process x 4-virtual-device gloo dryrun as a subprocess pair:
the pipeline's stage mesh spans both processes, so chunk hops and the ring
wrap cross a real process boundary (the multi-host DCN topology, minus the
hardware). Asserts both processes report lossless continuous + pruned
schedules.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_pipeline_lossless():
    env = {**os.environ, "MULTIHOST_PORT": "29731",
           "MULTIHOST_NO_RECORD": "1"}   # keep the committed record stable
    # the children manage their own XLA_FLAGS / platform config
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "multihost_dryrun.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=ROOT)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert '"ok": true' in r.stdout, r.stdout
