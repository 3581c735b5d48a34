"""Run the whole example gallery (the de-facto regression suite)."""

import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def main():
    scripts = sorted(HERE.glob("*/*.py"))
    failures = []
    for script in scripts:
        t0 = time.perf_counter()
        result = subprocess.run([sys.executable, str(script)], capture_output=True)
        dt = time.perf_counter() - t0
        status = "OK " if result.returncode == 0 else "FAIL"
        print(f"{status} {script.relative_to(HERE)}  ({dt:.1f}s)")
        if result.returncode != 0:
            failures.append(script)
            print(result.stdout.decode()[-2000:])
            print(result.stderr.decode()[-2000:])
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
