"""Object-created event entry point (SURVEY §2 S1, reference parity).

The reference is invoked with an S3 object-created notification and
validates the envelope before converting: exactly ONE record per event,
and the record must carry bucket + key (reference pyarrow/main.py:18-50,
one-record guard at :31-36). This module reproduces that contract as a
plain function so an event-driven deployment (Lambda-alike, queue
consumer) can drive the Spark convert pipeline per object, while
directory-tail deployments use streaming/convert_stream.py instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .convert import ConvertResult, convert, derive_output_name


class EventValidationError(ValueError):
    """Malformed object-created event envelope."""


def parse_object_event(event: dict) -> tuple[str, str]:
    """Validate the envelope and return (bucket, key).

    Contract (matching the reference's guards): a 'Records' list with
    exactly one entry; the entry names an s3 bucket and object key.
    """
    records = event.get("Records")
    if not isinstance(records, list) or len(records) != 1:
        raise EventValidationError(
            f"expected exactly 1 record, got "
            f"{len(records) if isinstance(records, list) else 'none'}"
        )
    s3 = records[0].get("s3") or {}
    bucket = (s3.get("bucket") or {}).get("name")
    key = (s3.get("object") or {}).get("key")
    if not bucket or not key:
        raise EventValidationError("record missing s3 bucket name or object key")
    return bucket, key


def handle_object_event(
    spark: SparkSession,
    event: dict,
    dest_root: str,
    scheme: str = "s3a://",
    **convert_kwargs,
) -> ConvertResult:
    """One object-created event → one converted Parquet output.

    The output name follows the reference's key-stem rule
    (``derive_output_name``); ``scheme`` lets tests use ``file:///``
    paths while production uses ``s3a://bucket/key``.
    """
    bucket, key = parse_object_event(event)
    src = f"{scheme}{bucket}/{key}"
    out = f"{dest_root}/{derive_output_name(key)}"
    # Per-object conversion is the reference's deployment unit: global
    # total order + single logical output (convert mode='global').
    return convert(spark, src, out, mode="global", **convert_kwargs)
