"""Label vocabularies (plain strings — enums become broadcast allowlists).

Semantic parity with docling_core/types/doc/labels.py (reference repo);
values are part of the public docling-core data format.
"""

# DocItemLabel (labels.py:7-40)
CAPTION = "caption"
CHART = "chart"
CHECKBOX_SELECTED = "checkbox_selected"
CHECKBOX_UNSELECTED = "checkbox_unselected"
CODE = "code"
DOCUMENT_INDEX = "document_index"
EMPTY_VALUE = "empty_value"
FOOTNOTE = "footnote"
FORM = "form"
FORMULA = "formula"
GRADING_SCALE = "grading_scale"
HANDWRITTEN_TEXT = "handwritten_text"
KEY_VALUE_REGION = "key_value_region"
LIST_ITEM = "list_item"
PAGE_FOOTER = "page_footer"
PAGE_HEADER = "page_header"
PARAGRAPH = "paragraph"
PICTURE = "picture"
REFERENCE = "reference"
SECTION_HEADER = "section_header"
TABLE = "table"
TEXT = "text"
TITLE = "title"

DOC_ITEM_LABELS = frozenset(
    {
        CAPTION, CHART, CHECKBOX_SELECTED, CHECKBOX_UNSELECTED, CODE,
        DOCUMENT_INDEX, EMPTY_VALUE, FOOTNOTE, FORM, FORMULA, GRADING_SCALE,
        HANDWRITTEN_TEXT, KEY_VALUE_REGION, LIST_ITEM, PAGE_FOOTER,
        PAGE_HEADER, PARAGRAPH, PICTURE, REFERENCE, SECTION_HEADER, TABLE,
        TEXT, TITLE,
    }
)

# GroupLabel (labels.py:73-93)
GROUP_UNSPECIFIED = "unspecified"
GROUP_LIST = "list"  # unordered list
GROUP_ORDERED_LIST = "ordered_list"
GROUP_CHAPTER = "chapter"
GROUP_SECTION = "section"
GROUP_SHEET = "sheet"
GROUP_SLIDE = "slide"
GROUP_KEY_VALUE_AREA = "key_value_area"
GROUP_COMMENT_SECTION = "comment_section"
GROUP_FORM_AREA = "form_area"
GROUP_PICTURE_AREA = "picture_area"
GROUP_INLINE = "inline"

GROUP_LABELS = frozenset(
    {
        GROUP_UNSPECIFIED, GROUP_LIST, GROUP_ORDERED_LIST, GROUP_CHAPTER,
        GROUP_SECTION, GROUP_SHEET, GROUP_SLIDE, GROUP_KEY_VALUE_AREA,
        GROUP_COMMENT_SECTION, GROUP_FORM_AREA, GROUP_PICTURE_AREA,
        GROUP_INLINE,
    }
)

# ContentLayer (document.py:621-629)
LAYER_BODY = "body"
LAYER_FURNITURE = "furniture"
LAYER_BACKGROUND = "background"
CONTENT_LAYERS = frozenset({LAYER_BODY, LAYER_FURNITURE, LAYER_BACKGROUND})
DEFAULT_CONTENT_LAYERS = frozenset({LAYER_BODY})

# Default export label allowlist (document.py:59-76)
DEFAULT_EXPORT_LABELS = frozenset(
    {
        TITLE, DOCUMENT_INDEX, SECTION_HEADER, PARAGRAPH, TABLE, PICTURE,
        FORMULA, CHECKBOX_SELECTED, CHECKBOX_UNSELECTED, TEXT, LIST_ITEM,
        CODE, REFERENCE, PAGE_HEADER, PAGE_FOOTER, KEY_VALUE_REGION,
    }
)

# + footnote, caption, form extras (document.py:78-86); this is also the
# serializers' default label set (serializer/common.py:56)
DOCUMENT_TOKENS_EXPORT_LABELS = DEFAULT_EXPORT_LABELS | frozenset(
    {FOOTNOTE, CAPTION, FORM}
)

# TableCellLabel (labels.py:143-153)
CELL_COLUMN_HEADER = "col_header"
CELL_ROW_HEADER = "row_header"
CELL_ROW_SECTION = "row_section"
CELL_BODY = "body"

# GraphCellLabel (labels.py:167-179) / GraphLinkLabel (labels.py:191-200)
GRAPH_CELL_KEY = "key"
GRAPH_CELL_VALUE = "value"
GRAPH_CELL_CHECKBOX = "checkbox"
GRAPH_LINK_TO_VALUE = "to_value"
GRAPH_LINK_TO_KEY = "to_key"
GRAPH_LINK_TO_PARENT = "to_parent"
GRAPH_LINK_TO_CHILD = "to_child"

# CoordOrigin (types/doc/base.py)
COORD_TOPLEFT = "TOPLEFT"
COORD_BOTTOMLEFT = "BOTTOMLEFT"

# CodeLanguageLabel (labels.py:203-266) — public data-format values
CODE_LANGUAGES = (
    "Ada", "Awk", "Bash", "bc", "C", "C#", "C++", "CMake", "COBOL",
    "CSS", "Ceylon", "Clojure", "Crystal", "Cuda", "Cython", "D",
    "Dart", "dc", "Dockerfile", "Elixir", "Erlang", "FORTRAN", "Forth",
    "Go", "HTML", "Haskell", "Haxe", "Java", "JavaScript", "Julia",
    "Kotlin", "Lisp", "Lua", "Matlab", "MoonScript", "Nim", "OCaml",
    "ObjectiveC", "Octave", "PHP", "Pascal", "Perl", "Prolog", "Python",
    "Racket", "Ruby", "Rust", "SML", "SQL", "Scala", "Scheme", "Swift",
    "TypeScript", "unknown", "VisualBasic", "XML", "YAML",
)

# Formatting.script values (document.py:841-848)
SCRIPT_VALUES = ("baseline", "sub", "super")

# TextItem's allowed label subset (the plain-TextItem discriminated
# union arm — labels NOT claimed by a specialized item class;
# document.py:851-916)
TEXT_ITEM_LABELS = (
    CAPTION, CHECKBOX_SELECTED, CHECKBOX_UNSELECTED, FOOTNOTE,
    PAGE_FOOTER, PAGE_HEADER, PARAGRAPH, REFERENCE, TEXT, EMPTY_VALUE,
)

# GroupLabel values in the reference's enum order (labels.py:73-93)
GROUP_LABELS_ORDERED = (
    GROUP_UNSPECIFIED, GROUP_LIST, GROUP_ORDERED_LIST, GROUP_CHAPTER,
    GROUP_SECTION, GROUP_SHEET, GROUP_SLIDE, GROUP_FORM_AREA,
    GROUP_KEY_VALUE_AREA, GROUP_COMMENT_SECTION, GROUP_INLINE,
    GROUP_PICTURE_AREA,
)
