"""Shared parquet → Dataset reader.

The synthetic fixture files carry a ``pandas`` schema-metadata blob, and a
:class:`pyarrow.Schema` whose metadata holds a dict is UNHASHABLE — which
defeats Ray Data's schema-dedup fast path and logs a "Failed to hash the
schemas (for deduplication)" warning on every downstream block concat.
Reading with an explicitly metadata-stripped schema keeps the column
pruning AND gives every block a clean, hashable schema.
"""

from __future__ import annotations

from typing import Optional


def read_parquet_clean(path: str, *, columns: Optional[list[str]] = None, **kwargs):
    """``ray.data.read_parquet`` with file-level schema metadata stripped
    (column pruning via ``columns`` preserved)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    try:
        sch = pq.read_schema(path)
    except (OSError, pa.ArrowInvalid):
        # directory of part files — take the dataset-level schema
        import pyarrow.dataset as pads

        sch = pads.dataset(path, format="parquet").schema
    sch = sch.remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)
