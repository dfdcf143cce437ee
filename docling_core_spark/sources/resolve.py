"""File/URL source resolution (reference utils/file.py:23-198 parity).

The pure decision logic is mirrored exactly — Content-Disposition
filename extraction, URL-path basename fallback, the Google
Docs/Drive/Sheets/Slides export-URL rewrite — and parity-tested against
the reference's own functions (no network needed). The fetch itself is
plain `requests`; on a cluster the driver resolves sources to
distributed-filesystem paths and hands them to `spark.read`, which
already speaks file:/hdfs:/s3a: URIs natively (`spark_source_path`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from io import BytesIO
from pathlib import Path
from typing import Dict, Optional, Tuple
from urllib.parse import urlsplit

_GOOGLE_RE = re.compile(
    r"google\.com\/(file|document|spreadsheets|presentation)\/d\/([\w-]+)"
)

_GOOGLE_EXPORT = {
    "file": "https://drive.google.com/uc?export=download&id={id}",
    "document": "https://docs.google.com/document/d/{id}/export?format=docx",
    "spreadsheets":
        "https://docs.google.com/spreadsheets/d/{id}/export?format=xlsx",
    "presentation":
        "https://docs.google.com/presentation/d/{id}/export?format=pptx",
}


@dataclass
class DocumentStream:
    """Named binary stream (reference types/io.py analog)."""

    name: str
    stream: BytesIO


def resolve_remote_filename(
    url: str, response_headers: Dict[str, str], fallback_filename: str = "file"
) -> str:
    """Filename from Content-Disposition, else URL path basename, else
    fallback (utils/file.py:23-50)."""
    fname = None
    if cont_disp := response_headers.get("Content-Disposition"):
        for par in cont_disp.strip().split(";"):
            if (split := par.split("=")) and split[0].strip() == "filename":
                fname = "=".join(split[1:]).strip().strip("'\"") or None
                break
    if fname is None:
        fname = Path(urlsplit(url).path or "").name or fallback_filename
    return fname


def rewrite_google_url(url: str) -> str:
    """Google Docs/Drive/Sheets/Slides share links -> direct export URLs
    (utils/file.py:83-106); other URLs pass through unchanged."""
    m = _GOOGLE_RE.search(url)
    if not m:
        return url
    return _GOOGLE_EXPORT[m.group(1)].format(id=m.group(2))


def classify_source(source) -> Tuple[str, str]:
    """('http'|'path', normalized source)."""
    s = str(source)
    if urlsplit(s).scheme in ("http", "https"):
        return "http", rewrite_google_url(s)
    return "path", s


def resolve_source_to_stream(
    source, headers: Optional[Dict[str, str]] = None
) -> DocumentStream:
    """URL or local path -> named binary stream."""
    kind, src = classify_source(source)
    if kind == "http":
        import requests

        req_headers = {k.lower(): v for k, v in (headers or {}).items()}
        req_headers.setdefault("user-agent", "docling-core-spark/0")
        res = requests.get(src, stream=True, headers=req_headers)
        res.raise_for_status()
        fname = resolve_remote_filename(src, res.headers)
        return DocumentStream(name=fname, stream=BytesIO(res.content))
    p = Path(src)
    return DocumentStream(name=p.name, stream=BytesIO(p.read_bytes()))


def resolve_source_to_path(
    source,
    headers: Optional[Dict[str, str]] = None,
    workdir: Optional[Path] = None,
) -> Path:
    """URL or path -> local file path (downloads URLs into workdir)."""
    import tempfile

    kind, src = classify_source(source)
    if kind == "path":
        return Path(src)
    ds = resolve_source_to_stream(src, headers=headers)
    workdir = workdir or Path(tempfile.mkdtemp())
    workdir.mkdir(exist_ok=True, parents=True)
    local_path = workdir / ds.name
    with local_path.open("wb") as f:
        f.write(ds.stream.read())
    return local_path


def spark_source_path(source) -> str:
    """Normalize a source for spark.read: scheme-ful URIs that Spark's
    Hadoop FS layer speaks (file:, hdfs:, s3a:, gs:, abfs[s]:, wasb[s]:)
    pass through; bare paths stay relative to the default FS; http(s)
    sources must be staged first (resolve_source_to_path) since
    HTTP is not a Hadoop filesystem."""
    s = str(source)
    scheme = urlsplit(s).scheme
    if scheme in ("http", "https"):
        raise ValueError(
            "http(s) sources must be staged via resolve_source_to_path "
            "before spark.read (HTTP is not a Hadoop filesystem)"
        )
    return s
