"""Command-line utilities (viewer analog of the reference's cli/)."""
