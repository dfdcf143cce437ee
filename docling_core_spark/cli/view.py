"""CLI viewer: render a DoclingDocument JSON file to HTML (or
markdown / doctags / element-tree) — the engine's analog of the
reference's `cli/view.py` (load JSON -> export_to_html(EMBEDDED) ->
write file -> open browser). argparse instead of typer (not in this
environment); `--open` gates the browser call so the tool works
headless; extra `--format` values expose the other serializers for
terminal use.

Usage:
    python -m docling_core_spark.cli.view doc.json [-o out.html]
        [--format html|markdown|doctags|etree] [--open]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path


def render(doc: dict, fmt: str) -> str:
    if fmt == "html":
        from ..serialize.html import export_to_html

        return export_to_html(doc, image_mode="embedded")
    if fmt == "markdown":
        from ..serialize.markdown import serialize_markdown

        return serialize_markdown(doc).text
    if fmt == "doctags":
        from ..serialize.doctags import export_to_doctags

        return export_to_doctags(doc)
    if fmt == "etree":
        from ..serialize.etree import export_to_element_tree

        return export_to_element_tree(doc)
    raise ValueError(f"unknown format: {fmt}")


def view(source: str, out: str | None = None, fmt: str = "html",
         open_browser: bool = False) -> str:
    """Load -> render -> write; returns the output path ('-' = stdout)."""
    import json

    from ..model.json_io import from_reference_json
    from ..sources.resolve import resolve_source_to_path

    path = resolve_source_to_path(source)
    with open(path, encoding="utf-8") as f:
        doc = from_reference_json(json.load(f))
    text = render(doc, fmt)
    if out == "-":
        sys.stdout.write(text + "\n")
        return "-"
    if out is None:
        suffix = {"html": ".html", "markdown": ".md",
                  "doctags": ".dt", "etree": ".et"}[fmt]
        out = str(Path(tempfile.mkdtemp()) / f"out{suffix}")
    with open(out, "w", encoding="utf-8") as f:
        f.write(text)
    if open_browser:  # reference behavior; opt-in here (headless envs)
        import webbrowser

        webbrowser.open(url=f"file://{Path(out).absolute().resolve()}")
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        prog="docling-spark-view",
        description="Render a Docling JSON document for viewing.",
    )
    p.add_argument("source", help="Docling JSON file (path or URL)")
    p.add_argument("-o", "--out", default=None,
                   help="output file ('-' for stdout; default: temp file)")
    p.add_argument("--format", default="html", dest="fmt",
                   choices=["html", "markdown", "doctags", "etree"])
    p.add_argument("--open", action="store_true", dest="open_browser",
                   help="open the result in the default browser")
    args = p.parse_args(argv)
    out = view(args.source, args.out, args.fmt, args.open_browser)
    if out != "-":
        print(out)


if __name__ == "__main__":
    main()
