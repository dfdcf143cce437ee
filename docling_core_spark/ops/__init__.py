"""Operational layer: checkpointed, resumable batch runs with a
per-shard lineage + metrics ledger (SURVEY.md §2.6/§4.3)."""

from .ledger import (  # noqa: F401
    LedgerEntry,
    pending_shards,
    read_ledger,
    run_with_ledger,
)
