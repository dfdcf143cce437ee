"""Media-ref rewriting: the engine analog of the reference's picture
externalization (`_with_pictures_refs`, document.py:2821-2868).

The engine carries media as opaque URI strings (`media_ref`), never
bytes, so externalization is a pure columnar rewrite: every picture /
chart span whose ref is an inline `data:` URI gets a deterministic
artifact path

    {image_dir}/image_{ordinal:06d}_{md5(old_ref)}.png

mirroring the reference's `image_{count:06}_{hexhash}.png` naming
(ordinal counts pictures in span order, as the reference counts
PictureItems in iterate order; the hash is md5 of the URI string since
the engine never decodes payload bytes — the byte-writing itself belongs
to the I/O layer that owns the artifact store).

Implemented twice on purpose:
  - `externalize_spans_sql()` — a Spark `transform()` higher-order
    expression over the spans array: zero shuffle, zero Python, runs
    inside whole-stage codegen at any corpus size;
  - `externalize_spans_py()` — an independent pure-Python
    implementation used by tools/gen_goldens.py, making the gate oracle
    a genuine dual-implementation cross-check.

The inverse (embedding file refs as data: URIs) requires the actual
bytes and therefore lives with the artifact-store I/O layer, exactly as
the reference's `_with_embedded_pictures` requires PIL + readable files
(document.py:2795-2819); with no byte store attached the engine keeps
refs untouched rather than fabricating payloads.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("picture", "chart")
DEFAULT_IMAGE_DIR = "artifacts"


def _new_ref_sql(s: str, ordinal: str, image_dir: str) -> str:
    return (
        f"concat('{image_dir}/image_', lpad(cast({ordinal} as string), 6,"
        f" '0'), '_', md5(encode({s}.media_ref, 'utf-8')), '.png')"
    )


def _is_media_sql(x: str) -> str:
    kinds = " OR ".join(f"{x}.kind = '{k}'" for k in MEDIA_KINDS)
    return f"(({kinds}) AND {x}.media_ref LIKE 'data:%')"


def _ordinal_sql(spans: str, i: str) -> str:
    kinds = " OR ".join(f"x.kind = '{k}'" for k in MEDIA_KINDS)
    return f"size(filter(slice({spans}, 1, {i}), x -> ({kinds})))"


def externalize_spans_sql(
    image_dir: str = DEFAULT_IMAGE_DIR, spans_col: str = "spans"
) -> str:
    """Rewritten spans array (struct order: kind, text, media_ref,
    offset) as one JVM transform() expression."""
    ordinal = _ordinal_sql(spans_col, "i")
    return (
        f"transform({spans_col}, (s, i) -> CASE WHEN {_is_media_sql('s')}"
        f" THEN named_struct('kind', s.kind, 'text', s.text,"
        f" 'media_ref', {_new_ref_sql('s', ordinal, image_dir)},"
        f" 'offset', s.offset) ELSE s END)"
    )


def manifest_sql(
    image_dir: str = DEFAULT_IMAGE_DIR, spans_col: str = "spans"
) -> str:
    """Array of (pic_idx, old_ref, new_ref) structs for rewritten spans."""
    ordinal = _ordinal_sql(spans_col, "i")
    return (
        f"filter(transform({spans_col}, (s, i) -> CASE WHEN"
        f" {_is_media_sql('s')} THEN named_struct("
        f" 'pic_idx', {ordinal}, 'old_ref', s.media_ref,"
        f" 'new_ref', {_new_ref_sql('s', ordinal, image_dir)})"
        f" ELSE null END), x -> x IS NOT NULL)"
    )


def externalize_media(
    docs: DataFrame, image_dir: str = DEFAULT_IMAGE_DIR
) -> DataFrame:
    """docs(doc_id, spans) -> same shape with data: refs externalized."""
    return docs.withColumn("spans", F.expr(externalize_spans_sql(image_dir)))


def media_manifest(
    docs: DataFrame, image_dir: str = DEFAULT_IMAGE_DIR
) -> DataFrame:
    """Exploded manifest (doc_id, pic_idx, old_ref, new_ref) — the
    worklist the artifact-store writer consumes."""
    return (
        docs.select(
            "doc_id", F.explode(F.expr(manifest_sql(image_dir))).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.pic_idx").cast("long").alias("pic_idx"),
            "m.old_ref",
            "m.new_ref",
        )
    )


# --- independent pure-Python twin (golden generator / doc-level API) ------

def externalize_spans_py(
    spans: List[dict], image_dir: str = DEFAULT_IMAGE_DIR
) -> Tuple[List[dict], List[dict]]:
    """(rewritten spans, manifest rows) — independent of the SQL path."""
    out, manifest = [], []
    ordinal = 0
    for s in spans:
        s = dict(s)
        if s.get("kind") in MEDIA_KINDS:
            ref = s.get("media_ref") or ""
            if ref.startswith("data:"):
                h = hashlib.md5(ref.encode()).hexdigest()
                new_ref = f"{image_dir}/image_{ordinal:06d}_{h}.png"
                manifest.append(
                    {
                        "pic_idx": ordinal,
                        "old_ref": ref,
                        "new_ref": new_ref,
                    }
                )
                s["media_ref"] = new_ref
            ordinal += 1
        out.append(s)
    return out, manifest


def with_externalized_media(
    doc: dict, image_dir: str = DEFAULT_IMAGE_DIR
) -> dict:
    """Doc-level rewrite (the `_with_pictures_refs` analog): pictures
    whose media_ref is a data: URI get artifact paths; ordinal counts
    pictures in array order (== iterate order for span-built docs)."""
    import copy

    doc = copy.deepcopy(doc)
    for i, pic in enumerate(doc.get("pictures", [])):
        ref = pic.get("media_ref") or ""
        if ref.startswith("data:"):
            h = hashlib.md5(ref.encode()).hexdigest()
            pic["media_ref"] = f"{image_dir}/image_{i:06d}_{h}.png"
    return doc


# --- media-caption pairing (image-text pair mining) ------------------------
# The corpus-level extraction a multimodal training run consumes: one
# row per picture/chart span paired with its caption text. The pairing
# rule is positional and deterministic in BOTH implementations: the
# span immediately AFTER the media span wins if it is a `caption` kind
# (figures are captioned below), else the span immediately BEFORE,
# else no caption. This mirrors the document model's caption wiring
# (serialize/common.captions_of_some_item) at span granularity,
# without building the tree — the cheap distributed path for mining
# (image, text) contrastive pairs out of 10^12 interleaved documents.


def caption_pairs_sql(spans_col: str = "spans") -> str:
    """Array of struct(pic_idx, kind, media_ref, caption, cap_src) as
    one JVM transform/filter expression (zero shuffle, zero Python).
    Uses try_element_at so the boundary probes are NULL under ANSI."""
    kinds = " OR ".join(f"s.kind = '{k}'" for k in MEDIA_KINDS)
    nxt = f"try_element_at({spans_col}, i + 2)"
    prv = f"try_element_at({spans_col}, i)"
    cap_next = f"CASE WHEN {nxt}.kind = 'caption' THEN {nxt}.text END"
    cap_prev = (
        f"CASE WHEN i >= 1 AND {prv}.kind = 'caption'"
        f" THEN {prv}.text END"
    )
    ordinal = _ordinal_sql(spans_col, "i")
    return (
        f"filter(transform({spans_col}, (s, i) -> CASE WHEN ({kinds})"
        f" THEN named_struct("
        # _ordinal_sql counts media spans BEFORE index i (0-based);
        # +1 makes pic_idx the 1-based count including this one,
        # matching caption_pairs_py
        f"'pic_idx', {ordinal} + 1,"
        f" 'kind', s.kind,"
        f" 'media_ref', s.media_ref,"
        f" 'caption', coalesce({cap_next}, {cap_prev}, ''),"
        f" 'cap_src', CASE WHEN {cap_next} IS NOT NULL THEN 'after'"
        f" WHEN {cap_prev} IS NOT NULL THEN 'before'"
        f" ELSE 'none' END)"
        f" END), x -> x IS NOT NULL)"
    )


def media_captions(docs: DataFrame) -> DataFrame:
    """Exploded (doc_id, pic_idx, kind, media_ref, caption, cap_src) —
    one row per media span. pic_idx counts media spans in span order
    (1-based ordinal from the slice-filter, matching media_manifest's
    0-based + 1 semantics is avoided: here it is the COUNT of media
    spans up to and including this one, i.e. 1-based)."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.expr(caption_pairs_sql())).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.pic_idx").cast("long").alias("pic_idx"),
            "c.kind",
            "c.media_ref",
            "c.caption",
            "c.cap_src",
        )
    )


def caption_pairs_py(spans: List[dict]) -> List[dict]:
    """Independent pure-Python twin of caption_pairs_sql (golden
    generator side of the dual-implementation oracle)."""
    out = []
    ordinal = 0
    for i, s in enumerate(spans):
        if s.get("kind") not in MEDIA_KINDS:
            continue
        ordinal += 1
        nxt = spans[i + 1] if i + 1 < len(spans) else None
        prv = spans[i - 1] if i >= 1 else None
        if nxt is not None and nxt.get("kind") == "caption":
            caption, src = nxt.get("text") or "", "after"
        elif prv is not None and prv.get("kind") == "caption":
            caption, src = prv.get("text") or "", "before"
        else:
            caption, src = "", "none"
        out.append(
            {
                "pic_idx": ordinal,
                "kind": s.get("kind"),
                "media_ref": s.get("media_ref") or "",
                "caption": caption,
                "cap_src": src,
            }
        )
    return out
