"""Driver-contract tests for __graft_entry__.

The driver calls ``dryrun_multichip(8)`` bare, in an environment where the
default JAX backend may be a (possibly broken) TPU tunnel and no CPU
device-count forcing is set.  Round 1 failed exactly this way
(MULTICHIP_r01.json ok=false), so this test emulates the driver: a fresh
subprocess with the session's real env (axon vars included, JAX_PLATFORMS /
XLA_FLAGS unset) making the bare call.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_from_driver_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    assert "OK" in proc.stdout
