"""Driver graft-contract tests (VERDICT round-1 items 1-2).

``dryrun_multichip`` must self-bootstrap an n-device virtual CPU mesh when
the calling process has fewer devices (the driver's process sees one real
TPU chip), and ``bench.py`` must print exactly one parsable JSON line even
when the build fails.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_env(**extra):
    """Environment for a fresh child that sees exactly ONE cpu device (no
    virtual-mesh XLA flag, no axon TPU plugin) — the driver scenario minus
    the tunnel RPCs."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH", "JAX_PLATFORMS",
                        "_BETACORES_DRYRUN_CHILD")}
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    # fresh children don't run conftest: hand them the suite's persistent
    # compilation cache (compile-bound tests; see tests/conftest.py)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(ROOT, ".cache", "jax_test_compile"))
    env.update(extra)
    return env


def test_dryrun_multichip_self_bootstraps():
    """Fresh process with 1 visible device calling dryrun_multichip(8) must
    re-exec itself onto an 8-device virtual CPU mesh and pass. Smoke mode
    (flagship sharded build + weighted build only): the bootstrap mechanics
    are what this test owns; the full seven-subsystem dryrun runs every
    round via the driver (MULTICHIP_r0N.json) and each subsystem has its
    own tests in test_parallel.py (round-3 verdict item 8: this test was
    28 s of the suite's 16-min budget)."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax, __graft_entry__ as g; "
         "assert len(jax.devices()) == 1, jax.devices(); "
         "g.dryrun_multichip(8); print('BOOTSTRAP_OK')"],
        env=_fresh_env(_BETACORES_DRYRUN_SMOKE="1"), cwd=ROOT,
        capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "BOOTSTRAP_OK" in r.stdout


def test_bench_failure_still_prints_json():
    """bench.py must emit one parsable JSON record even when the run fails
    (round-1 BENCH artifact was rc=1 with no record). Force failure fast by
    making the import of the builder blow up via a poisoned N."""
    code = (
        "import bench, sys\n"
        "def boom():\n"
        "    raise RuntimeError('injected failure')\n"
        "bench.run = boom\n"
        "import time; time.sleep = lambda s: None\n"
        "sys.exit(bench.main())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], env=_fresh_env(), cwd=ROOT,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 1
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "bcores_build_n1m_m100_logreg_seconds"
    assert rec["value"] == -1.0 and "injected failure" in rec["error"]


def test_dryrun_axon_env_never_probes_backend():
    """Under the axon TPU platform, backend init is a tunnel RPC that can
    hang indefinitely during an outage (observed 2026-08-17), so the parent
    must decide to bootstrap from the ENVIRONMENT alone. Pin it by setting
    JAX_PLATFORMS=axon without the axon plugin on PYTHONPATH: any
    jax.devices() call in the parent would raise 'unknown backend', so
    reaching the child proves backend init was never touched."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; "
         "g.dryrun_multichip(2); print('AXON_GATE_OK')"],
        env=_fresh_env(JAX_PLATFORMS="axon", _BETACORES_DRYRUN_SMOKE="1"),
        cwd=ROOT, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "AXON_GATE_OK" in r.stdout
