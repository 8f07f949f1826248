"""Input-source connectors (Common-Crawl-style containers)."""

from lucene_spark.sources.warc import (  # noqa: F401
    parse_warc_records,
    read_warc,
    warc_bytes,
)
