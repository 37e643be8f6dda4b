"""Schema introspection: render a Spark schema as a JSON-able dict.

Parity with the reference's ``schema_to_json`` lineage logging
(reference pyarrow/main.py:282-297: struct → dict, list → [element],
scalar → type name), used to log before/after schemas around the ``_dt``
rewrite."""

from __future__ import annotations

from pyspark.sql import types as T


def schema_to_dict(dtype: T.DataType) -> object:
    if isinstance(dtype, T.StructType):
        return {f.name: schema_to_dict(f.dataType) for f in dtype.fields}
    if isinstance(dtype, T.ArrayType):
        return [schema_to_dict(dtype.elementType)]
    if isinstance(dtype, T.MapType):
        return {
            "<map>": [schema_to_dict(dtype.keyType), schema_to_dict(dtype.valueType)]
        }
    return dtype.simpleString()
