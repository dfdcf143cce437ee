"""Pluggable token-counter adapters for the hybrid chunker.

Parity target: the reference's tokenizer protocol
(transforms/chunker/tokenizer/base.py:9-27) and its two concrete
adapters — HuggingFace (tokenizer/huggingface.py) and OpenAI/tiktoken
(tokenizer/openai.py:1-33). The engine's HybridChunkerConfig consumes a
bare `count_tokens` callable (chunk/hybrid.py), so each adapter here is
a thin object exposing the reference's three-method surface
(count_tokens / get_max_tokens / get_tokenizer) plus `as_counter()` for
the config.

Both external tokenizer libraries are absent in this sandbox (for the
reference too — its openai.py raises at import, openai.py:8-13), so the
constructors are import-gated with the same fail-at-construction
contract and the vendored WordPiece (chunk/wordpiece.py) remains the
default. The adapters' plumbing (protocol surface, config wiring,
executor-side lazy construction) is tested without the libraries; the
library-backed paths are pytest.importorskip-gated.

At scale the counter is constructed ONCE per executor process (lazy
module-level or closure capture), never per row — the same discipline
as make_hf_counter (hybrid.py)."""

from __future__ import annotations

from typing import Callable


class TokenizerAdapter:
    """Reference BaseTokenizer surface over a counting callable."""

    def __init__(self, counter: Callable[[str], int], max_tokens: int,
                 tokenizer=None):
        self._counter = counter
        self._max_tokens = int(max_tokens)
        self._tokenizer = tokenizer

    def count_tokens(self, text: str) -> int:
        return self._counter(text)

    def get_max_tokens(self) -> int:
        return self._max_tokens

    def get_tokenizer(self):
        """The underlying tokenizer object (the semchunk injection
        point, hybrid_chunker.py:231-233); falls back to the counter
        callable, which chunk/semsplit.chunkerify accepts."""
        return self._tokenizer if self._tokenizer is not None \
            else self._counter

    def as_counter(self) -> Callable[[str], int]:
        return self._counter


def wordpiece_tokenizer(max_tokens: int = 64) -> TokenizerAdapter:
    """The vendored-WordPiece default (always available)."""
    from .wordpiece import wordpiece_count_tokens

    return TokenizerAdapter(wordpiece_count_tokens, max_tokens)


def openai_tokenizer(
    max_tokens: int, encoding_name: str = "cl100k_base"
) -> TokenizerAdapter:
    """tiktoken-backed adapter (reference tokenizer/openai.py:16-33).
    Raises RuntimeError at construction when tiktoken is absent — the
    same contract as the reference's import-time gate
    (openai.py:8-13)."""
    try:
        import tiktoken
    except ImportError as err:
        raise RuntimeError(
            "openai_tokenizer requires the external 'tiktoken' package,"
            " which is not available in this environment"
        ) from err
    enc = tiktoken.get_encoding(encoding_name)
    return TokenizerAdapter(
        lambda text: len(enc.encode(text)), max_tokens, tokenizer=enc
    )


def huggingface_tokenizer(
    max_tokens: int, model_name: str
) -> TokenizerAdapter:
    """transformers-backed adapter (reference tokenizer/huggingface.py);
    import-gated like make_hf_counter (hybrid.py)."""
    try:
        from transformers import AutoTokenizer
    except ImportError as err:
        raise RuntimeError(
            "huggingface_tokenizer requires the external 'transformers'"
            " package, which is not available in this environment"
        ) from err
    tok = AutoTokenizer.from_pretrained(model_name)
    return TokenizerAdapter(
        lambda text: len(tok.tokenize(text, max_length=None)),
        max_tokens, tokenizer=tok,
    )
