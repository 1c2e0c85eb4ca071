"""Sources: batch + streaming ingest of the reference transaction shape."""
