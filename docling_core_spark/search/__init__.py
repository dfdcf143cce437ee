"""Search-index tooling (reference search/ parity)."""
