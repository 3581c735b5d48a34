"""Run the whole example gallery (the de-facto regression suite)."""

import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def main():
    scripts = sorted(HERE.glob("*/*.py"))
    figures_dir = HERE / "_figures"
    failures = []
    for script in scripts:
        t0 = time.perf_counter()
        result = subprocess.run([sys.executable, str(script)], capture_output=True)
        dt = time.perf_counter() - t0
        # Smoke-check the gallery figures (reference parity: the sphinx-
        # gallery scripts render field/convergence plots).
        n_figs = len(list(figures_dir.glob(f"{script.stem}_*.png")))
        status = "OK " if result.returncode == 0 else "FAIL"
        print(f"{status} {script.relative_to(HERE)}  ({dt:.1f}s, {n_figs} figs)")
        if result.returncode != 0:
            failures.append(script)
            print(result.stdout.decode()[-2000:])
            print(result.stderr.decode()[-2000:])
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
