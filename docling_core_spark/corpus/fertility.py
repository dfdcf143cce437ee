"""Tokenizer fertility census: how many subword tokens the REAL
tokenizer spends per whitespace word, per language.

Whitespace/regex token counts (token_stats) approximate cost; the
number that actually prices a training corpus is the subword count
under the model's own tokenizer. This operator runs the engine's
vendored WordPiece (chunk/wordpiece.py — the same tokenizer the hybrid
chunker budgets with) over every document and rolls up per language:

  - fertility_ppm = subword tokens per basic-tokenized word (x 1e6) —
    the standard tokenizer-efficiency metric (high fertility = the
    vocab fits the language badly, the corpus costs more tokens than
    its text mass suggests);
  - unk_ppm = [UNK] share of subword tokens — vocab coverage.

Execution shape: one Arrow-batched `mapInPandas` stage (the tokenizer
is pure Python by nature — this is exactly the "Python only where
built-ins can't express it" slot, same as the parse pipeline), with
PER-BATCH PARTIAL AGGREGATION inside the stage: each Arrow batch emits
<= #langs rows (lang, n_docs, n_words, n_tokens, n_unk), so the
Python->JVM boundary and the single exchange carry batch-count x langs
rows, never document rows. The JVM-side groupBy then sums partials —
a map-side combine by construction.

Oracle: dual-implementation golden (tools/gen_fertility_golden.py) —
the same tokenizer run single-process over the same table; the gate
proves the distributed Arrow stage equals the sequential reference
run. (No external reference exists: the vendored WordPiece is the
engine's own, trained by tools/gen_vocab.py; goldens/README.md labels
this oracle class.) Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread

_OUT_SCHEMA = (
    "lang string, n_docs long, n_words long, n_tokens long, n_unk long"
)


def _fertility_rows(lang_texts) -> dict:
    """Shared per-batch aggregation core (Spark stage AND golden
    generator call this, so both sides are the same code path fed in a
    different order — the golden proves order-invariance and the
    distributed plumbing, not a second implementation)."""
    from ..chunk.wordpiece import UNK_TOKEN, basic_tokenize, load_default

    tok = load_default()
    agg: dict = {}
    for lang, text in lang_texts:
        words = basic_tokenize(text or "")
        n_tokens = 0
        n_unk = 0
        for w in words:
            pieces = tok.wordpiece(w)
            n_tokens += len(pieces)
            for p in pieces:
                if p == UNK_TOKEN:
                    n_unk += 1
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(words)
        a[2] += n_tokens
        a[3] += n_unk
    return agg


def q_tok_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select("lang", "text")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            agg = _fertility_rows(zip(pdf["lang"], pdf["text"]))
            if agg:
                yield pd.DataFrame(
                    {
                        "lang": list(agg),
                        "n_docs": [a[0] for a in agg.values()],
                        "n_words": [a[1] for a in agg.values()],
                        "n_tokens": [a[2] for a in agg.values()],
                        "n_unk": [a[3] for a in agg.values()],
                    }
                )

    partials = docs.mapInPandas(batches, schema=_OUT_SCHEMA)
    return (
        partials.groupBy("lang")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_unk").cast("bigint").alias("n_unk"),
        )
        .select(
            "lang", "n_docs", "n_words", "n_tokens", "n_unk",
            # NULL (not a crash, identically in the golden) when a
            # language has no words / no tokens at all
            F.expr(
                "case when n_words = 0 then null"
                " else cast(n_tokens * 1000000 div n_words as bigint)"
                " end"
            ).alias("fertility_ppm"),
            F.expr(
                "case when n_tokens = 0 then null"
                " else cast(n_unk * 1000000 div n_tokens as bigint)"
                " end"
            ).alias("unk_ppm"),
        )
    )


def sql_tok_fertility(sf_dir: str) -> str:
    """Golden-backed oracle: the single-process run of the same
    tokenizer over the same table (tools/gen_fertility_golden.py)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    path = os.path.join(repo, "goldens", f"sf{sf}", "tok_fertility.parquet")
    return f"SELECT * FROM read_parquet('{path}')"
