"""Train the vendored WordPiece vocab on the deterministic fixture
corpus and write it to docling_core_spark/chunk/assets/wordpiece_vocab.txt.

The corpus is the engine's own synthetic span corpus (fixtures.gen_spans
— the same generator behind every gate query), so the vocab is fully
reproducible offline: same corpus + same deterministic trainer
(chunk/wordpiece.py:train_wordpiece) => byte-identical vocab.txt.

Usage: python tools/gen_vocab.py [n_docs] [vocab_size]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(n_docs: int = 2000, vocab_size: int = 4096) -> None:
    from docling_core_spark.chunk.wordpiece import train_wordpiece
    from docling_core_spark.fixtures import SHAPE_IDS, gen_spans

    ids = list(SHAPE_IDS) + [f"doc-{i:08d}" for i in range(n_docs)]
    texts = [
        s["text"]
        for did in ids
        for s in gen_spans(did)
        if s.get("text")
    ]
    t0 = time.time()
    vocab = train_wordpiece(texts, vocab_size=vocab_size)
    out = os.path.join(
        _REPO, "docling_core_spark", "chunk", "assets",
        "wordpiece_vocab.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")
    print(
        f"wrote {out}: {len(vocab)} tokens from {len(texts)} spans"
        f" ({n_docs} docs) in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
