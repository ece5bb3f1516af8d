"""Sources: synthetic Common-Crawl-style corpus generator, HTML→text
extraction, and batch/stream readers."""
