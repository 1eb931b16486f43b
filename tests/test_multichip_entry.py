"""The driver's graded multi-chip check: run __graft_entry__.dryrun_multichip
in a fresh subprocess with the driver's env (no test-harness overrides).

Round-1 failed precisely because only tests/conftest.py configured the
8-virtual-device CPU backend; dryrun_multichip must now self-configure
(VERDICT.md 'Next round' #1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver does not set the virtual-device flag
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTEST_CURRENT_TEST", None)
    return env


def test_dryrun_multichip_self_configures():
    res = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "dryrun_multichip OK" in res.stdout


def test_dryrun_multichip_after_backend_init():
    """If the process already initialized a 1-device backend (the driver may
    call entry() first), dryrun must fall back to a clean subprocess."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "assert len(jax.devices()) < 8;"  # backend up with too few devices
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
