"""Extract the reference's HTML stylesheet blocks from its OWN exported
HTML output (not from its source files) into data assets the engine's
HTML serializer embeds for full-document byte parity.

The stylesheet is part of the reference's observable output — every
`export_to_html` file carries it in <head> — so reproducing those bytes
is the same kind of output parity as the markdown/doctags goldens. The
assets are committed; rerun this tool only to refresh them against a new
reference version.

Usage: python tools/extract_ref_css.py
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

ASSETS = os.path.join(_REPO, "docling_core_spark", "serialize", "assets")

# capture the exact CSS head segment the reference emits between the
# generator <meta> and </head> (includes any leading/trailing newlines
# the reference's style block carries, which matter for byte parity)
_STYLE_RE = re.compile(
    r'<meta name="generator" content="Docling HTML Serializer">\n'
    r"(.*?)\n</head>",
    re.DOTALL,
)


def main() -> None:
    from ref_oracle import install_reference

    install_reference()
    from docling_core.transforms.serializer.html import (
        HTMLDocSerializer,
        HTMLOutputStyle,
        HTMLParams,
    )
    from docling_core.types.doc.document import DoclingDocument

    doc = DoclingDocument(name="css-probe")
    doc.add_text(label="text", text="probe")

    os.makedirs(ASSETS, exist_ok=True)
    for style, fname in (
        (HTMLOutputStyle.SINGLE_COLUMN, "html_single_column.css"),
        (HTMLOutputStyle.SPLIT_PAGE, "html_split_page.css"),
    ):
        html = HTMLDocSerializer(
            doc=doc, params=HTMLParams(output_style=style)
        ).serialize().text
        m = _STYLE_RE.search(html)
        assert m, f"no <style> block in reference {style} output"
        path = os.path.join(ASSETS, fname)
        with open(path, "w") as f:
            f.write(m.group(1))
        print(f"wrote {path} ({len(m.group(1))} bytes)")


if __name__ == "__main__":
    main()
