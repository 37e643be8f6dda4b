"""Event-envelope entry point: validation guards + end-to-end convert."""

from __future__ import annotations

import gzip
import json

import pytest

from json_to_parquet_spark.operators.events import (
    EventValidationError,
    handle_object_event,
    parse_object_event,
)


def _event(bucket="b", key="k.ndjson.gz", n_records=1):
    rec = {"s3": {"bucket": {"name": bucket}, "object": {"key": key}}}
    return {"Records": [rec] * n_records}


def test_envelope_validation():
    assert parse_object_event(_event()) == ("b", "k.ndjson.gz")
    with pytest.raises(EventValidationError, match="exactly 1"):
        parse_object_event(_event(n_records=2))
    with pytest.raises(EventValidationError, match="exactly 1"):
        parse_object_event({"Records": []})
    with pytest.raises(EventValidationError, match="exactly 1"):
        parse_object_event({})
    with pytest.raises(EventValidationError, match="missing"):
        parse_object_event({"Records": [{"s3": {"bucket": {}, "object": {}}}]})


def test_event_drives_convert_end_to_end(spark, tmp_path):
    bucket_dir = tmp_path / "bucket"
    bucket_dir.mkdir()
    with gzip.open(bucket_dir / "obj.ndjson.gz", "wt") as f:
        for i in range(5):
            f.write(json.dumps({"time": 10 - i, "t_dt": "2025-05-01T00:00:00Z"}) + "\n")

    res = handle_object_event(
        spark,
        _event(bucket=str(bucket_dir).lstrip("/"), key="obj.ndjson.gz"),
        dest_root=str(tmp_path / "out"),
        scheme="file:///",
    )
    assert res.rows == 5
    assert res.sorted_by == "time"
    assert res.output_path.endswith("/obj.zst.parquet")  # key-stem naming
    out = spark.read.parquet(res.output_path)
    assert [r.time for r in out.orderBy("time").collect()] == [6, 7, 8, 9, 10]
    assert dict(out.dtypes)["t_dt"] == "timestamp"