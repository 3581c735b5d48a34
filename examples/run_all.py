"""Run the whole example gallery (the de-facto regression suite)."""

import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def main():
    scripts = sorted(HERE.glob("*/*.py"))
    figures_dir = HERE / "_figures"
    stems = {s.stem for s in scripts}

    def figs_of(script):
        # Exact per-script figures: a stem can prefix a sibling stem
        # (reaction vs reaction_mixed), so a figure belongs to the LONGEST
        # stem that prefixes it — exclude it here only when a longer stem
        # claims it (the old any-prefix rule also matched the script's own
        # stem, so reaction_mixed's figures were counted for no script).
        out = []
        for f in figures_dir.glob(f"{script.stem}_*.png"):
            if any(
                other != script.stem
                and len(other) > len(script.stem)
                and f.stem.startswith(other + "_")
                for other in stems
            ):
                continue
            out.append(f)
        return out

    failures = []
    for script in scripts:
        # Stale figures from a previous run must not mask a regression.
        for f in figs_of(script):
            f.unlink()
        t0 = time.perf_counter()
        result = subprocess.run([sys.executable, str(script)], capture_output=True)
        dt = time.perf_counter() - t0
        # Smoke-check the gallery figures (reference parity: the sphinx-
        # gallery scripts render field/convergence plots).
        n_figs = len(figs_of(script))
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
