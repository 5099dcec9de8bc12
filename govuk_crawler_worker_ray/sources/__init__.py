"""Sources/sinks: Lance-first document IO with parquet fallback."""

from .documents import read_documents, write_documents  # noqa: F401
