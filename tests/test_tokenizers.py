"""Tokenizer adapter surface (chunk/tokenizers.py) vs the reference's
BaseTokenizer protocol (tokenizer/base.py, tokenizer/openai.py)."""

import pytest

from docling_core_spark.chunk.hybrid import (
    HybridChunkerConfig,
    hybrid_chunk_doc,
)
from docling_core_spark.chunk.tokenizers import (
    TokenizerAdapter,
    huggingface_tokenizer,
    openai_tokenizer,
    wordpiece_tokenizer,
)
from docling_core_spark.chunk.wordpiece import wordpiece_count_tokens
from docling_core_spark.parse.spans import parse_span_doc


def test_wordpiece_adapter_protocol():
    tok = wordpiece_tokenizer(max_tokens=64)
    assert tok.get_max_tokens() == 64
    assert tok.count_tokens("hello world") == wordpiece_count_tokens(
        "hello world"
    )
    # get_tokenizer falls back to the counter callable — the semsplit
    # chunkerify injection point accepts it
    from docling_core_spark.chunk.semsplit import chunkerify

    ck = chunkerify(tok.get_tokenizer(), 8)
    pieces = ck.chunk("one two three four five six seven eight nine ten")
    assert all(tok.count_tokens(p) <= 8 for p in pieces)


def test_adapter_drives_hybrid_chunker():
    doc, _ = parse_span_doc(
        "t",
        [
            {"kind": "section_header_level_1", "text": "Head",
             "media_ref": "", "offset": 0},
            {"kind": "text", "text": "hello world " * 40,
             "media_ref": "", "offset": 1},
        ],
    )
    tok = wordpiece_tokenizer(max_tokens=32)
    cfg = HybridChunkerConfig(
        max_tokens=tok.get_max_tokens(), count_tokens=tok.as_counter()
    )
    out = hybrid_chunk_doc(doc, cfg)
    assert out
    assert all(
        tok.count_tokens(c.text) <= cfg.max_tokens for c in out
    )


def test_external_adapters_fail_at_construction_without_libs():
    """The reference's openai.py raises at import when tiktoken is
    absent (openai.py:8-13); the engine mirrors that contract at
    construction time. If the libs ARE present, construction must
    succeed and satisfy the protocol instead."""
    try:
        tok = openai_tokenizer(max_tokens=128)
    except RuntimeError as err:
        assert "tiktoken" in str(err)
    else:
        assert tok.get_max_tokens() == 128
        assert tok.count_tokens("hello world") >= 2
    try:
        tok = huggingface_tokenizer(
            max_tokens=64,
            model_name="sentence-transformers/all-MiniLM-L6-v2",
        )
    except RuntimeError as err:
        assert "transformers" in str(err)
    except Exception:
        pytest.skip("transformers importable but model not fetchable")
    else:
        assert tok.get_max_tokens() == 64


def test_custom_counter_adapter():
    tok = TokenizerAdapter(lambda t: len(t.split()), 10)
    assert tok.count_tokens("a b c") == 3
    assert tok.as_counter()("a b") == 2
