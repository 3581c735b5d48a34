"""Run the whole example gallery (the de-facto regression suite).

Two execution modes:

- default (pre-forked): the parent imports the heavy modules ONCE (the
  sandbox sitecustomize makes every fresh interpreter pay ~2 s preloading
  jax + the TPU plugin; numpy/scipy/matplotlib add ~1 s more), then runs
  each script in a FORKED child — per-script process isolation at
  warm-interpreter cost.  This is the fix for the gallery's cold-start
  deficit vs the reference's smallest scripts (BENCH.md section 5): the
  floor is interpreter start, not solve time.
- ``--spawn``: one fresh interpreter per script (the prior behavior),
  which measures the true cold cost including the sitecustomize floor.
"""

import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def _run_forked(script: Path) -> int:
    """Execute ``script`` as __main__ in a forked child of this process."""
    import multiprocessing as mp

    def target(path):
        import runpy

        sys.argv = [str(path)]
        runpy.run_path(str(path), run_name="__main__")

    proc = mp.get_context("fork").Process(target=target, args=(script,))
    proc.start()
    proc.join()
    return int(proc.exitcode or 0)


def main():
    forked = "--spawn" not in sys.argv
    if forked:
        # Pay the import bill once, before the first fork.  Keep this to
        # module IMPORTS only — creating a JAX backend before forking is
        # not fork-safe (XLA runtime threads do not survive fork); the
        # children each initialize their own backend.
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot  # noqa: F401
        import scipy  # noqa: F401

        import mfv2d_tpu  # noqa: F401

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
    timings: list[tuple[str, float]] = []
    for script in scripts:
        # Stale figures from a previous run must not mask a regression.
        for f in figs_of(script):
            f.unlink()
        t0 = time.perf_counter()
        if forked:
            rc = _run_forked(script)
        else:
            result = subprocess.run(
                [sys.executable, str(script)], capture_output=True
            )
            rc = result.returncode
        dt = time.perf_counter() - t0
        # Smoke-check the gallery figures (reference parity: the sphinx-
        # gallery scripts render field/convergence plots).
        n_figs = len(figs_of(script))
        status = "OK " if rc == 0 else "FAIL"
        print(f"{status} {script.relative_to(HERE)}  ({dt:.1f}s, {n_figs} figs)")
        if rc == 0:
            timings.append((str(script.relative_to(HERE)), dt))
        if rc != 0:
            failures.append(script)
            if not forked:
                print(result.stdout.decode()[-2000:])
                print(result.stderr.decode()[-2000:])
    # Per-script wall times for the gallery page (docs/build_gallery.py),
    # the analogue of the reference's sg_execution_times.rst.
    figures_dir.mkdir(exist_ok=True)
    (figures_dir / "timings.txt").write_text(
        "".join(f"{name} {dt:.2f}\n" for name, dt in timings)
    )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
