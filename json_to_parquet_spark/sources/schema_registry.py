"""File-backed schema registry: pin an inferred NDJSON schema once, reuse
it for every subsequent object of the feed.

Why this exists (SURVEY §7c): Spark's per-file union-schema inference is
correct for one file but *nondeterministic across a heterogeneous feed* —
two objects of the same logical stream can infer different widths, and
every inference pass is an extra read of the (unsplittable) source. The
production contract is therefore: infer ONCE on the first object, persist
the schema, and pin every later conversion to it. The registry is a plain
JSON file (Spark's own ``StructType.json()`` wire format) so it works on
any shared filesystem and diffs cleanly in code review.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T


def save_schema(schema: T.StructType, path: str) -> None:
    """Persist a schema as Spark StructType JSON (atomic via temp+rename)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(schema.json())
    os.replace(tmp, path)


def load_schema(path: str) -> T.StructType:
    with open(path) as f:
        loaded = T.StructType.fromJson(json.load(f))
    if not isinstance(loaded, T.StructType):
        raise TypeError(f"{path} does not contain a struct schema")
    return loaded
