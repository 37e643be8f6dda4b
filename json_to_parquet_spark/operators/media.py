"""Multimodal decode / feature-extract plumbing (SURVEY §2.C X5).

Treats image/audio/video as opaque ``BinaryType`` payloads with a typed
metadata struct, and runs decode/feature kernels as Arrow-batched
``mapInPandas`` — the Spark-idiomatic shape for Python-side media work:
whole Arrow batches cross the JVM↔Python boundary once per partition
chunk (not per row), partitioning is preserved, and the output schema is
declared up front so Catalyst can plan around the opaque stage.

The container ships no media codecs, so the real decode kernel is a
clearly-marked stub (``decode_image`` raises ``NotImplementedError``);
``fake_decode`` is a deterministic stand-in with the same signature so
the plumbing — schema, batching, UDF shape — is fully exercised by tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Decode an image payload → (width, height, channels).

    STUB: no image codecs (Pillow/libjpeg/...) in this environment. On a
    real cluster, swap in the codec of choice; everything around this
    function (batching, schema, partitioning) is production-shaped.
    """
    raise NotImplementedError(
        "image decoding requires a codec library not present in this build"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decode: pretend the first bytes are a header.
    Same signature/contract as decode_image, so tests exercise the real
    plumbing with a fake kernel."""
    h = hashlib.sha256(payload).digest()
    return (h[0] + 1, h[1] + 1, (h[2] % 4) + 1)


def extract_media_features(
    media: DataFrame,
    decode: Callable[[bytes], tuple[int, int, int]] = decode_image,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """media(id, payload binary, ...) → per-item features via mapInPandas.

    One Python worker per partition, Arrow batches in/out; the decode
    kernel sees raw bytes only. At 100 TB this stage is embarrassingly
    parallel — no shuffle is introduced.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "sha256": pdf[payload_col].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
            }
            dims = pdf[payload_col].map(lambda b: decode(bytes(b)))
            out["width"] = dims.map(lambda d: d[0]).astype("int32")
            out["height"] = dims.map(lambda d: d[1]).astype("int32")
            out["channels"] = dims.map(lambda d: d[2]).astype("int32")
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

FRAME_BYTES = 64


def extract_frames(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
) -> DataFrame:
    """Frame-sampling plumbing: one input row → N frame rows (the
    video/audio chunking shape). Demonstrates variable-cardinality
    ``mapInPandas`` output — each Arrow batch in yields an exploded batch
    out, no shuffle, partitioning preserved. The "frame decoder" here is
    a deterministic fixed-stride splitter + content hash (stand-in for a
    real codec's frame boundaries, same contract)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens, hashes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n = max(1, math.ceil(len(b) / frame_bytes))
                for i in range(n):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    lens.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media-shaped frame (binary payload
    + metadata struct) for tests and the x14 catalog query."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("origin"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)

RESIZE_BOX = 64  # fit-into square box (pixels)


def resize_media(
    media: DataFrame,
    decode: Callable[[bytes], tuple[int, int, int]] = decode_image,
    box: int = RESIZE_BOX,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Aspect-preserving fit-into-box resize via ``mapInPandas`` — the
    third media stage (decode → features → RESIZE → frame-sample).  Only
    payloads whose longer decoded side exceeds ``box`` are resized:
    out = floor(src * box / max(src_w, src_h)), clamped to ≥ 1 — pure
    integer arithmetic, identical in any engine.

    The pixel-resampling kernel itself is the STUB (a real cluster swaps
    in Pillow/libvips); the stand-in emits the first out_w·out_h payload
    bytes as the "resized" artifact, so the batching/schema/branching
    plumbing is value-checkable end-to-end (same contract as
    ``fake_decode``).  Embarrassingly parallel: no shuffle, one Python
    worker per partition, whole Arrow batches across the boundary.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                sw, sh, _ = decode(b)
                mx = max(sw, sh)
                if mx > box:
                    ow = max(1, sw * box // mx)
                    oh = max(1, sh * box // mx)
                else:
                    ow, oh = sw, sh
                out = b[: ow * oh]
                rows["doc_id"].append(int(doc_id))
                rows["src_width"].append(sw)
                rows["src_height"].append(sh)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized"].append(mx > box)
                rows["out_bytes"].append(len(out))
                rows["resized_md5"].append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "src_width": pd.Series(rows["src_width"], dtype="int32"),
                    "src_height": pd.Series(rows["src_height"], dtype="int32"),
                    "out_width": pd.Series(rows["out_width"], dtype="int32"),
                    "out_height": pd.Series(rows["out_height"], dtype="int32"),
                    "resized": pd.Series(rows["resized"], dtype="bool"),
                    "out_bytes": pd.Series(rows["out_bytes"], dtype="int64"),
                    "resized_md5": pd.Series(rows["resized_md5"], dtype="object"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)
