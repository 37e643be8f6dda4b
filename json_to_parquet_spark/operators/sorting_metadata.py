"""Parquet ``SortingColumn`` footer metadata post-pass (SURVEY §2 O3).

The reference records the sort order in the Parquet footer
(reference pyarrow/main.py:76-80,144: ``pq.SortingColumn.from_ordering``)
so downstream readers can skip re-sorting. Spark's Parquet writer has no
hook for this, so the engine closes the gap with a PyArrow post-pass:
rewrite each part file with identical data/settings plus the
``sorting_columns`` footer entry.

Cost: one extra read+write of the output — acceptable for the reference's
deployment unit (one small object per event, ``mode='global'``); for
multi-TB cluster output leave it off (the range-partitioned, per-file-
sorted layout already gives readers min/max pruning without the footer).
The post-pass runs per-file and is embarrassingly parallel if ever needed
at scale.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from ..session import PARQUET_PAGE_SIZE


def add_sorting_metadata(dest: str, sort_column: str, descending: bool = False) -> int:
    """Rewrite every part file under ``dest`` with a SortingColumn footer.

    Returns the number of files rewritten. Rows are NOT re-sorted — the
    writer (convert) already ordered them; this only records the fact.
    """
    rewritten = 0
    for path in sorted(glob.glob(os.path.join(dest, "*.parquet"))):
        table = pq.read_table(path)
        if sort_column not in table.schema.names:
            continue
        sorting = [
            pq.SortingColumn(
                table.schema.get_field_index(sort_column), descending=descending
            )
        ]
        tmp = path + ".tmp"
        pq.write_table(
            table,
            tmp,
            compression="zstd",
            data_page_size=PARQUET_PAGE_SIZE,
            use_deprecated_int96_timestamps=False,
            sorting_columns=sorting,
        )
        os.replace(tmp, path)
        # Hadoop's LocalFileSystem wrote a .crc sidecar for the original
        # bytes; it would fail verification against the rewritten file.
        crc = os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
        rewritten += 1
    return rewritten


def read_sorting_metadata(dest: str) -> dict[str, list[tuple[int, bool]]]:
    """{file basename → [(column_index, descending), ...]} for inspection."""
    out: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(dest, "*.parquet"))):
        md = pq.ParquetFile(path).metadata
        cols: list[tuple[int, bool]] = []
        rg = md.row_group(0)
        if rg.sorting_columns:
            cols = [(sc.column_index, sc.descending) for sc in rg.sorting_columns]
        out[os.path.basename(path)] = cols
    return out
