#!/usr/bin/env python
"""Render the markdown doc set to a static HTML site (one command).

    python docs/build_api.py        # refresh docs/api/*.md
    python docs/build_gallery.py    # refresh docs/gallery.md (after run_all)
    python docs/build_site.py       # writes docs/_site/*.html

The reference publishes a sphinx site with an executed gallery
(reference docs/conf.py + docs/sg_execution_times.rst); this repo's doc
set is plain markdown, so the site build is a small converter: every
``docs/**/*.md`` becomes an HTML page with a shared nav, ``.md`` links
rewrite to ``.html``, and the gallery's figures (``examples/_figures``)
are copied in so the artifact is self-contained.  Uses python-markdown
when available and falls back to a <pre> wrapper otherwise (the build
must never fail for want of a renderer).
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
DOCS = ROOT / "docs"
SITE = DOCS / "_site"

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — mfv2d_tpu</title>
<style>
 body {{ font-family: system-ui, sans-serif; max-width: 60rem; margin: 0 auto;
        padding: 1rem 2rem; line-height: 1.55; color: #1a202c; }}
 nav {{ border-bottom: 1px solid #e2e8f0; padding-bottom: .5rem;
       margin-bottom: 1.5rem; font-size: .9rem; }}
 nav a {{ margin-right: 1rem; color: #2b6cb0; text-decoration: none; }}
 pre {{ background: #f7fafc; border: 1px solid #e2e8f0; border-radius: 6px;
       padding: .75rem 1rem; overflow-x: auto; font-size: .85rem; }}
 code {{ background: #f7fafc; border-radius: 3px; padding: .1em .25em; }}
 pre code {{ background: none; border: none; padding: 0; }}
 img {{ max-width: 100%; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #e2e8f0; padding: .3rem .6rem; }}
 h1, h2, h3 {{ line-height: 1.25; }}
</style>
</head>
<body>
<nav>
<a href="{root}index.html">mfv2d_tpu</a>
<a href="{root}gallery.html">Gallery</a>
<a href="{root}api/index.html">API</a>
<a href="{root}theory.html">Theory</a>
<a href="{root}tpu_design.html">TPU design</a>
<a href="{root}parallel.html">Multi-chip</a>
</nav>
{body}
</body>
</html>
"""


def _render_markdown(text: str) -> str:
    try:
        import markdown

        return markdown.markdown(
            text, extensions=["tables", "fenced_code", "toc"]
        )
    except Exception:
        import html

        return f"<pre>{html.escape(text)}</pre>"


def _rewrite_links(text: str, depth: int) -> str:
    # .md -> .html for intra-site links (not external URLs).
    text = re.sub(
        r"\(((?!https?://)[^)#]*)\.md(#[^)]*)?\)", r"(\1.html\2)", text
    )
    # Gallery figure paths: ../examples/_figures/x.png -> _figures/x.png
    # (the figures are copied into the site root below).
    prefix = "../" * depth
    text = text.replace("(../examples/_figures/", f"({prefix}_figures/")
    return text


def build() -> int:
    if SITE.exists():
        shutil.rmtree(SITE)
    SITE.mkdir(parents=True)
    n = 0
    for md in sorted(DOCS.rglob("*.md")):
        rel = md.relative_to(DOCS)
        if rel.parts[0] == "_site":
            continue
        depth = len(rel.parts) - 1
        out = SITE / rel.with_suffix(".html")
        out.parent.mkdir(parents=True, exist_ok=True)
        text = _rewrite_links(md.read_text(), depth)
        body = _render_markdown(text)
        title = rel.stem.replace("_", " ")
        for line in text.splitlines():
            if line.startswith("# "):
                title = line[2:].strip()
                break
        out.write_text(
            _PAGE.format(title=title, body=body, root="../" * depth)
        )
        n += 1
    figures = ROOT / "examples" / "_figures"
    if figures.is_dir():
        dest = SITE / "_figures"
        dest.mkdir(exist_ok=True)
        for fig in figures.glob("*.png"):
            shutil.copy(fig, dest / fig.name)
    print(f"built {n} pages -> {SITE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(build())
