"""Parsers: interleaved span streams and DocTags token strings -> documents."""
