"""Generate the tok_fertility golden: the vendored WordPiece tokenizer
run SINGLE-PROCESS over the documents table, aggregated per language —
the sequential twin of the distributed Arrow stage in
corpus/fertility.py (both call the same _fertility_rows core, so the
gate proves the distributed plumbing is order/partition-invariant).

Usage: python tools/gen_fertility_golden.py [sf0.001 sf0.01 ...]
Writes goldens/sf*/tok_fertility.parquet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from docling_core_spark.corpus.fertility import _fertility_rows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen(sf: str) -> None:
    src = f"/root/testdata/{sf}/documents.parquet"
    t = pq.read_table(src, columns=["lang", "text"])
    agg = _fertility_rows(
        zip(t["lang"].to_pylist(), t["text"].to_pylist())
    )
    langs = sorted(agg)
    rows = {
        "lang": langs,
        "n_docs": [agg[l][0] for l in langs],
        "n_words": [agg[l][1] for l in langs],
        "n_tokens": [agg[l][2] for l in langs],
        "n_unk": [agg[l][3] for l in langs],
        "fertility_ppm": [
            (agg[l][2] * 1_000_000 // agg[l][1]) if agg[l][1] else None
            for l in langs
        ],
        "unk_ppm": [
            (agg[l][3] * 1_000_000 // agg[l][2]) if agg[l][2] else None
            for l in langs
        ],
    }
    out_dir = os.path.join(REPO, "goldens", sf)
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("n_docs", pa.int64()),
            ("n_words", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_unk", pa.int64()),
            ("fertility_ppm", pa.int64()),
            ("unk_ppm", pa.int64()),
        ]
    )
    pq.write_table(
        pa.table(rows, schema=schema),
        os.path.join(out_dir, "tok_fertility.parquet"),
    )
    print(f"{sf}: {len(langs)} langs, "
          f"{sum(agg[l][2] for l in langs)} tokens")


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["sf0.001", "sf0.01"]:
        gen(sf)
