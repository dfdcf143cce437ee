"""Structure-aware chunkers (SURVEY.md §2.4).

`hierarchical` mirrors the reference HierarchicalChunker
(transforms/chunker/hierarchical_chunker.py:212-262) over our dict
document model; `hybrid` adds token-budget refinement
(transforms/chunker/hybrid_chunker.py:295-323) with a self-contained
deterministic tokenizer (the HF tokenizer is gated behind import-try —
not available in this environment).
"""

from .hierarchical import Chunk, chunk_doc  # noqa: F401
from .hybrid import HybridChunkerConfig, hybrid_chunk_doc  # noqa: F401
