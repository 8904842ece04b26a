from .ingest import incremental_sketch_stream  # noqa: F401
