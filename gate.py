#!/usr/bin/env python
"""One-command quality gate: tests + golden-fixture freshness + solve smoke.

The reference protects itself with nox sessions + GitHub workflows
(reference noxfile.py:6-11, .github/workflows/cmake-single-platform.yml);
this repo's equivalent is a single command::

    python gate.py            # QUICK tier (<5 min): suite minus -m slow
    python gate.py --full     # everything (the slow sharded VMS/Newton
                              #   parity tests roughly quadruple the wall)
    python gate.py --tpu      # additionally run the TPU tier on the chip

Exit code 0 means the tree is green.  Steps:

1. ``pytest tests/ -q`` on the CPU backend (virtual 8-device mesh) —
   ``-m "not slow"`` by default, the full suite with ``--full``.
2. Golden-fixture freshness: regenerate the reference compiler fixtures
   into a temp file and diff against the committed ones — catches compiler
   changes that silently drift from the pinned reference output.
3. Solve smoke: one tiny steady mixed-Poisson solve end-to-end (catches
   packaging/import regressions the unit tests can miss).
4. (``--tpu``) ``MFV2D_TPU_TESTS=1 pytest -m tpu`` on the real accelerator.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).parent


def _run(name: str, cmd: list[str], env: dict | None = None) -> bool:
    print(f"[gate] {name}: {' '.join(cmd)}", flush=True)
    merged = dict(os.environ)
    if env:
        merged.update(env)
    result = subprocess.run(cmd, cwd=ROOT, env=merged)
    ok = result.returncode == 0
    print(f"[gate] {name}: {'OK' if ok else f'FAIL (rc={result.returncode})'}", flush=True)
    return ok


def golden_freshness() -> bool:
    """Regenerate compiler fixtures to a temp path and diff."""
    committed = ROOT / "tests" / "golden" / "reference_compiler_strings.txt"
    with tempfile.TemporaryDirectory() as tmp:
        # The generator writes next to itself; run it against a copy.
        gen = ROOT / "tests" / "golden" / "make_compiler_fixtures.py"
        tmp_gen = Path(tmp) / "make_compiler_fixtures.py"
        shutil.copy(gen, tmp_gen)
        rc = subprocess.run(
            [sys.executable, str(tmp_gen)], cwd=ROOT, env=dict(os.environ)
        ).returncode
        if rc != 0:
            print("[gate] golden regen: generator failed", flush=True)
            return False
        fresh = Path(tmp) / "reference_compiler_strings.txt"
        if not fresh.exists():
            print("[gate] golden regen: no output produced", flush=True)
            return False
        ok = fresh.read_bytes() == committed.read_bytes()
        print(
            "[gate] golden freshness: "
            + ("OK (byte-identical)" if ok else "FAIL (fixtures drifted)"),
            flush=True,
        )
        return ok


_SMOKE = r"""
import jax

# The sandbox sitecustomize imports jax and registers the TPU platform
# before env vars can take effect; the config update after import is the
# only reliable way to keep the smoke on the host CPU (a wedged TPU relay
# would otherwise hang the gate).
jax.config.update("jax_platforms", "cpu")
import numpy as np
import mfv2d_tpu as mf
from mfv2d_tpu.examples import unit_square_mesh
from mfv2d_tpu.models.poisson import mixed_poisson, u_exact

model = mixed_poisson()
mesh = unit_square_mesh(3, 3, 4)
solution, stats, _ = mf.solve_system_2d(
    mesh,
    system_settings=mf.SystemSettings(model.system),
    solver_settings=mf.SolverSettings(
        mf.ConvergenceSettings(absolute_tolerance=1e-10, relative_tolerance=0)
    ),
    recon_order=8,
)
grid = solution[-1]
vals = grid.point_data["u"]
x, y = grid.points[:, 0], grid.points[:, 1]
err = float(np.sqrt(np.mean((vals - u_exact(x, y)) ** 2)))
assert err < 1e-3, f"smoke solve error too large: {err}"
print(f"[gate] smoke solve OK (err={err:.2e})")
"""


def smoke() -> bool:
    env = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip(),
    }
    return _run("smoke", [sys.executable, "-c", _SMOKE], env=env)


def main() -> int:
    want_tpu = "--tpu" in sys.argv
    full = "--full" in sys.argv
    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if not full:
        # Quick tier: everything except the @pytest.mark.slow sharded
        # VMS/Newton parity tests (measured: they are ~80% of the wall).
        # Marker expressions COMBINE with the addopts default (-m "not
        # tpu" in pyproject), so spell out both.
        pytest_cmd += ["-m", "not slow and not tpu"]
    steps = [
        ("pytest", lambda: _run("pytest", pytest_cmd)),
        ("golden", golden_freshness),
        ("smoke", smoke),
    ]
    if want_tpu:
        steps.append(
            (
                "tpu-tier",
                lambda: _run(
                    "tpu-tier",
                    [sys.executable, "-m", "pytest", "tests/", "-m", "tpu", "-q"],
                    env={"MFV2D_TPU_TESTS": "1"},
                ),
            )
        )
    failures = [name for name, fn in steps if not fn()]
    if failures:
        print(f"[gate] FAILED: {', '.join(failures)}")
        return 1
    print("[gate] all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
