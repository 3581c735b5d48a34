#!/usr/bin/env python
"""Build the executed-gallery page from the example scripts' outputs.

The reference ships a sphinx-gallery site whose pages embed each script's
rendered figures and execution time (reference docs/conf.py +
docs/sg_execution_times.rst).  This repo's equivalent artifact is one
markdown page per run of the gallery:

    python examples/run_all.py          # executes all scripts -> _figures/
    python docs/build_gallery.py        # writes docs/gallery.md

The page groups scripts by section (steady / unsteady / refinement /
parallel), embeds each script's figures, quotes its module docstring, and
records the per-script wall time of the last `run_all.py` invocation when
a timings file is present (run_all writes examples/_figures/timings.txt).
"""

from __future__ import annotations

import ast
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
EXAMPLES = ROOT / "examples"
FIGURES = EXAMPLES / "_figures"
OUT = ROOT / "docs" / "gallery.md"


def _docstring(script: Path) -> str:
    try:
        tree = ast.parse(script.read_text())
        doc = ast.get_docstring(tree) or ""
    except SyntaxError:
        doc = ""
    return doc.strip()


def _timings() -> dict[str, float]:
    f = FIGURES / "timings.txt"
    out: dict[str, float] = {}
    if f.exists():
        for line in f.read_text().splitlines():
            parts = line.rsplit(" ", 1)
            if len(parts) == 2:
                try:
                    out[parts[0]] = float(parts[1])
                except ValueError:
                    pass
    return out


def main() -> None:
    scripts = sorted(EXAMPLES.glob("*/*.py"))
    stems = {s.stem for s in scripts}
    times = _timings()

    def figs_of(script: Path) -> list[Path]:
        out = []
        for f in sorted(FIGURES.glob(f"{script.stem}_*.png")):
            if any(
                other != script.stem
                and len(other) > len(script.stem)
                and f.stem.startswith(other + "_")
                for other in stems
            ):
                continue
            out.append(f)
        return out

    lines = [
        "# Example gallery",
        "",
        "Executed outputs of the example scripts (`python examples/run_all.py`"
        " regenerates the figures; `python docs/build_gallery.py` rebuilds"
        " this page).  Reference parity: the sphinx-gallery site the"
        " reference builds from its 15 scripts (docs/conf.py,"
        " docs/sg_execution_times.rst).",
        "",
    ]
    total = 0.0
    by_section: dict[str, list[Path]] = {}
    for s in scripts:
        by_section.setdefault(s.parent.name, []).append(s)
    for section in sorted(by_section):
        lines.append(f"## {section}")
        lines.append("")
        for s in by_section[section]:
            rel = s.relative_to(EXAMPLES)
            t = times.get(str(rel))
            stamp = f" — {t:.1f} s" if t is not None else ""
            if t is not None:
                total += t
            lines.append(f"### `{rel}`{stamp}")
            lines.append("")
            doc = _docstring(s)
            if doc:
                lines.append(doc)
                lines.append("")
            for f in figs_of(s):
                relf = Path("..") / f.relative_to(ROOT)
                lines.append(f"![{f.stem}]({relf.as_posix()})")
                lines.append("")
    if times:
        lines.append(
            f"**Total execution time: {total:.1f} s across"
            f" {len(times)} scripts** (pre-forked runner; the reference's"
            " 15-script gallery records 7:57.470,"
            " docs/sg_execution_times.rst:9)."
        )
        lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({len(scripts)} scripts, {len(times)} timed)")


if __name__ == "__main__":
    main()
