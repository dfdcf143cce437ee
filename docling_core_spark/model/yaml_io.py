"""YAML source/sink (reference document.py:2956-2993 parity).

The reference's YAML path is a thin wrapper over the canonical dict
export (`yaml.dump(export_to_dict())` / `yaml.load` + validate); ours
wraps the same canonical JSON dict, which byte-matches the reference's
model_dump (tests/test_parity.py, goldens MANIFEST), so the YAML text
is byte-identical too (yaml.dump sorts keys in both).

Image modes: the reference applies `_make_copy_with_refmode` first;
EMBEDDED (its default) only rewrites file: URIs through PIL — a no-op
for the engine's data:/opaque refs, mirrored here by writing refs
as-is; REFERENCED maps to ops/media.with_externalized_media.
"""

from __future__ import annotations

from typing import Union

from .json_io import from_reference_json, to_reference_json


def dump_yaml_str(doc: dict, default_flow_style: bool = False) -> str:
    import yaml

    return yaml.dump(
        to_reference_json(doc), default_flow_style=default_flow_style
    )


def save_as_yaml(
    doc: dict, filename: str, default_flow_style: bool = False,
    image_mode: str = "embedded",
) -> None:
    if image_mode == "referenced":
        from ..ops.media import with_externalized_media

        doc = with_externalized_media(doc)
    with open(filename, "w", encoding="utf-8") as fw:
        fw.write(dump_yaml_str(doc, default_flow_style))


def load_yaml_str(text: str) -> dict:
    import yaml

    return from_reference_json(yaml.load(text, Loader=yaml.FullLoader))


def load_from_yaml(filename: Union[str, bytes]) -> dict:
    with open(filename, encoding="utf-8") as f:
        return load_yaml_str(f.read())
