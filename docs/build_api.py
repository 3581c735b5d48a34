#!/usr/bin/env python
"""Generate the API reference from in-source docstrings (one command).

    python docs/build_api.py          # writes docs/api/<module>.md + index

The container ships no sphinx/pdoc/mkdocs (zero egress), so this walks the
package with inspect and emits plain markdown: public classes with their
method signatures and docstrings, public functions, and module docstrings.
The reference ships Sphinx autodoc pages (reference docs/modules/*.rst);
this is the equivalent artifact for the markdown doc set.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
OUT = ROOT / "docs" / "api"
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

PACKAGE = "mfv2d_tpu"


def _clean_doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else ""


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _document_class(cls, lines: list[str]) -> None:
    lines.append(f"### class `{cls.__name__}`\n")
    doc = _clean_doc(cls)
    if doc:
        lines.append(doc + "\n")
    members = []
    for name, member in inspect.getmembers(cls):
        if not _is_public(name):
            continue
        if inspect.isfunction(member) or inspect.ismethod(member):
            if member.__qualname__.startswith(cls.__name__ + "."):
                members.append((name, member, "method"))
        elif isinstance(inspect.getattr_static(cls, name, None), property):
            members.append((name, member, "property"))
    for name, member, kind in members:
        if kind == "property":
            lines.append(f"- **{name}** *(property)*")
            doc = _clean_doc(member.fget) if member.fget else ""
        else:
            lines.append(f"- **{name}**`{_signature(member)}`")
            doc = _clean_doc(member)
        if doc:
            first = doc.splitlines()[0]
            lines.append(f"  — {first}")
    lines.append("")


def _document_module(modname: str) -> str | None:
    try:
        mod = importlib.import_module(modname)
    except Exception as exc:  # keep building the rest
        return f"# `{modname}`\n\n*(import failed: {exc})*\n"
    lines: list[str] = [f"# `{modname}`\n"]
    doc = _clean_doc(mod)
    if doc:
        lines.append(doc + "\n")
    classes, functions = [], []
    for name, obj in vars(mod).items():
        if not _is_public(name):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # only objects defined here (no re-export dupes)
        if inspect.isclass(obj):
            classes.append(obj)
        elif inspect.isfunction(obj):
            functions.append(obj)
    if classes:
        lines.append("## Classes\n")
        for cls in classes:
            _document_class(cls, lines)
    if functions:
        lines.append("## Functions\n")
        for fn in functions:
            lines.append(f"### `{fn.__name__}{_signature(fn)}`\n")
            doc = _clean_doc(fn)
            if doc:
                lines.append(doc + "\n")
    if not classes and not functions and not doc:
        return None
    return "\n".join(lines) + "\n"


def main() -> None:
    OUT.mkdir(exist_ok=True)
    package = importlib.import_module(PACKAGE)
    modules = [PACKAGE]
    for info in pkgutil.walk_packages(package.__path__, prefix=PACKAGE + "."):
        if ".tests" in info.name or info.name.endswith("._core"):
            continue
        modules.append(info.name)
    index = ["# API reference\n",
             "Generated from in-source docstrings by `python docs/build_api.py`.\n"]
    for modname in sorted(modules):
        text = _document_module(modname)
        if text is None:
            continue
        fname = modname.replace(".", "_") + ".md"
        (OUT / fname).write_text(text)
        index.append(f"- [`{modname}`]({fname})")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(index) - 2} module pages to {OUT}")


if __name__ == "__main__":
    main()
