"""The ``_dt`` convention rewriter — the engine's one genuinely custom piece.

Reference semantics (SURVEY §1.3; reference pyarrow/main.py:172-279): every
STRING field whose name ends in ``_dt`` — at any nesting depth: top level,
inside structs, inside arrays of structs, recursively — is an ISO8601 string
and must become a UTC timestamp. Non-``_dt`` fields are untouched. The
pandas path of the reference (pandas/main.py:179-194) misses ``_dt`` fields
inside arrays-of-structs; we adopt the PyArrow path's full recursion.

Error handling: the reference diverges (PyArrow strict / pandas coerce-to-
null; SURVEY §1.3.3). Default is strict (raise on a non-null unparseable
string), with ``mode="coerce"`` for null-on-failure.

Spark-first design: this is NOT a row-level transformation. It is a pure
compile step ``StructType -> list[Column]`` executed once on the driver.
The emitted expression tree uses only JVM-side primitives —
``to_timestamp`` / ``try_to_timestamp``, ``Column.withField`` (preserves
struct nullness, unlike rebuilding with ``F.struct``), and the higher-order
``F.transform`` for arrays — so the whole rewrite stays inside whole-stage
codegen and Catalyst is free to prune/reorder around it. No UDFs, no
Python in the hot path, no driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DT_SUFFIX = "_dt"


def _is_dt_name(name: str) -> bool:
    return name.endswith(DT_SUFFIX)


def _cast_string_to_ts(col: Column, name: str, mode: str) -> Column:
    """string -> timestamp with strict/coerce error semantics.

    ``try_to_timestamp`` yields NULL on parse failure; strict mode turns a
    (non-null input, null output) pair into a raised error, matching the
    reference's PyArrow path which raises on non-ISO8601 input.
    """
    parsed = F.try_to_timestamp(col)
    if mode == "coerce":
        return parsed
    return F.when(
        col.isNotNull() & parsed.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"dt_rewrite: unparseable timestamp in field '{name}': '"),
                col,
                F.lit("'"),
            ).cast(T.StringType()),
        ).cast(T.TimestampType()),
    ).otherwise(parsed)


def _rewrite_expr(
    col: Column, dtype: T.DataType, name: str, mode: str, path: str, paths: list[str]
) -> Column | None:
    """Return a rewritten Column for ``col`` or None if nothing to change.

    Returning None (instead of an identity expression) keeps untouched
    columns out of the Project node entirely, so Catalyst sees them as
    pass-through and column pruning/pushdown are unaffected.
    """
    if isinstance(dtype, T.StringType) and _is_dt_name(name):
        paths.append(path)
        return _cast_string_to_ts(col, name, mode)

    if isinstance(dtype, T.StructType):
        result = col
        changed = False
        for field in dtype.fields:
            child = _rewrite_expr(
                col.getField(field.name),
                field.dataType,
                field.name,
                mode,
                f"{path}.{field.name}",
                paths,
            )
            if child is not None:
                # withField preserves the nullness of the struct itself
                # (null struct stays null) and all sibling fields.
                result = result.withField(field.name, child)
                changed = True
        return result if changed else None

    if isinstance(dtype, T.ArrayType):
        # Elements carry no field name of their own: the reference's list
        # path (pyarrow/main.py:258-279) recurses only into list<struct>
        # and passes list<string> through unchanged — so an array field
        # named '*_dt' must NOT have its string elements cast. Recursing
        # with an empty name reproduces exactly that: only named struct
        # fields inside the element can match the _dt rule.
        probe: list[str] = []
        sample = _rewrite_expr(
            F.lit(None).cast(dtype.elementType),
            dtype.elementType,
            "",
            mode,
            f"{path}[]",
            probe,
        )
        if sample is None:
            return None
        paths.extend(probe)
        return F.transform(
            col,
            lambda x: _rewrite_expr(x, dtype.elementType, "", mode, f"{path}[]", []),
        )

    if isinstance(dtype, T.MapType):
        # Map values may contain structs with _dt fields. Same rule as
        # arrays: the value slot is anonymous, so a map field named
        # '*_dt' does not cast plain string values.
        probe_v: list[str] = []
        sample_v = _rewrite_expr(
            F.lit(None).cast(dtype.valueType),
            dtype.valueType,
            "",
            mode,
            f"{path}{{}}",
            probe_v,
        )
        if sample_v is None:
            return None
        paths.extend(probe_v)
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(
                F.map_values(col),
                lambda v: _rewrite_expr(v, dtype.valueType, "", mode, f"{path}{{}}", []),
            ),
        )

    return None


def _rewrite_type(dtype: T.DataType, name: str = "") -> T.DataType:
    """The post-rewrite Spark type for ``dtype`` (for schema assertions)."""
    if isinstance(dtype, T.StringType) and _is_dt_name(name):
        return T.TimestampType()
    if isinstance(dtype, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _rewrite_type(f.dataType, f.name), f.nullable)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(_rewrite_type(dtype.elementType, ""), dtype.containsNull)
    if isinstance(dtype, T.MapType):
        return T.MapType(
            dtype.keyType,
            _rewrite_type(dtype.valueType, ""),
            dtype.valueContainsNull,
        )
    return dtype


def dt_rewrite_columns(
    schema: T.StructType, mode: str = "strict"
) -> tuple[list[Column], list[str]]:
    """Compile ``schema`` into the full top-level column list with every
    ``*_dt`` string site rewritten to timestamp.

    Returns (columns, rewritten_paths). Columns appear in original schema
    order; untouched columns are plain ``F.col`` references.
    """
    if mode not in ("strict", "coerce"):
        raise ValueError(f"mode must be 'strict' or 'coerce', got {mode!r}")
    cols: list[Column] = []
    paths: list[str] = []
    for field in schema.fields:
        expr = _rewrite_expr(
            F.col(field.name), field.dataType, field.name, mode, field.name, paths
        )
        if expr is None:
            cols.append(F.col(field.name))
        else:
            cols.append(expr.alias(field.name))
    return cols, paths


def dt_rewrite_paths(schema: T.StructType) -> list[str]:
    """Just the dotted paths that would be rewritten (for logging/lineage —
    the reference logs before/after schemas; SURVEY §2 U2)."""
    _, paths = dt_rewrite_columns(schema, mode="coerce")
    return paths


def rewrite_dt_fields(df: DataFrame, mode: str = "strict") -> DataFrame:
    """Apply the ``_dt`` rewrite to a DataFrame (no-op if no ``_dt`` sites)."""
    cols, paths = dt_rewrite_columns(df.schema, mode)
    if not paths:
        return df
    return df.select(*cols)
