"""Table IO seam (SURVEY.md §7.3 item 3): Iceberg-style snapshot/commit
semantics behind a small interface — parquet + ``_manifest.json`` in the
sandbox, a real Iceberg catalog on clusters (conf documented in
``tableio.iceberg_session_conf``). Operator code never touches
Iceberg-specific API.
"""

from .tableio import TableIO, iceberg_session_conf

__all__ = ["TableIO", "iceberg_session_conf"]
