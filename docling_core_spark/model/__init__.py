"""Document data model: labels, dict-based document graph, tables."""
