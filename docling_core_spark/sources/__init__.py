"""Source adapters (file resolution, span-table readers)."""
