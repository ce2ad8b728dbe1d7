"""Column-level functions: dead-letter formatting, error headers, text/similarity."""
