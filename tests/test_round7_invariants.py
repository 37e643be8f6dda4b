"""Semantic invariants for the round-7 fixes (beyond oracle parity).

VERDICT r6 flagged x179's bimodal execution (checkpoint-backed loop
frames re-materializing under a shared session) and asked for the x45
treatment: the fixed-point loop runs driver-side on the collected ≤V²
edge matrix, with the distributed DataFrame iteration retained as an
equality-tested twin. It also asked for a registered production-shape
SemDeDup (x214) and a partial-Gram x103; their structural invariants
live here too.
"""

from __future__ import annotations

import pytest

from json_to_parquet_spark.queries import registry


def test_x179_driver_loop_matches_distributed(spark, sf_dir):
    """The driver-side fixed-point loop (bounded ≤V²-row matrix) must be
    bit-identical to the retained DataFrame-iteration variant."""
    from json_to_parquet_spark.queries.pipeline import (
        TR_TOP,
        textrank_distributed_loop,
    )

    a = sorted(
        map(tuple, registry()["x179_textrank_keywords"].spark(spark, sf_dir).collect())
    )
    b = sorted(map(tuple, textrank_distributed_loop(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == TR_TOP
