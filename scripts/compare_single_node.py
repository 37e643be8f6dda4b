"""Single-node throughput comparison: reference-equivalent PyArrow path vs
the Spark convert pipeline on the same 100k-record nested NDJSON.gz.

The reference's engine is PyArrow (C++ JSON parse → columnar `_dt` rewrite
→ sort → parquet write); we time an equivalent pipeline through PyArrow's
public API (no reference code) against `convert()` to fill BASELINE.md's
"matches-or-beats single-node throughput" row with an honest number and
an honest framing: at one small object Spark pays JVM/scheduling overhead;
the crossover is many objects / large inputs, which is the actual target.

Usage: python scripts/compare_single_node.py [n_records]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def pyarrow_pipeline(src: str, dst: str) -> float:
    """Equivalent single-node pipeline via PyArrow public API."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.json as paj
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    table = paj.read_json(src)

    def rewrite(arr: pa.Array, name: str) -> pa.Array:
        if pa.types.is_string(arr.type) and name.endswith("_dt"):
            return arr.cast(pa.timestamp("us", tz="UTC"))
        if pa.types.is_struct(arr.type):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            fields = [arr.type.field(i) for i in range(arr.type.num_fields)]
            children = [
                rewrite(arr.field(f.name), f.name) for f in fields
            ]
            return pa.StructArray.from_arrays(
                children, [f.name for f in fields], mask=arr.is_null()
            )
        if pa.types.is_list(arr.type):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            values = rewrite(arr.values, name)
            return pa.ListArray.from_arrays(
                arr.offsets, values
            )
        return arr

    cols = [rewrite(table.column(i), table.schema.names[i]) for i in range(table.num_columns)]
    table = pa.table(dict(zip(table.schema.names, cols)))
    idx = pc.sort_indices(table, sort_keys=[("time", "ascending")])
    table = pc.take(table, idx)
    pq.write_table(
        table,
        dst,
        compression="zstd",
        data_page_size=1_048_576,
        use_deprecated_int96_timestamps=False,
    )
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import gzip
    import random

    from findings_fixture import make_record

    from json_to_parquet_spark.operators.convert import convert
    from json_to_parquet_spark.session import build_session

    tmp = tempfile.mkdtemp()
    src = f"{tmp}/in.ndjson.gz"
    rng = random.Random(11)
    with gzip.open(src, "wt") as f:
        for i in range(n):
            f.write(json.dumps(make_record(i, rng)) + "\n")

    t_arrow = pyarrow_pipeline(src, f"{tmp}/ref.parquet")

    spark = build_session(app_name="compare")
    # warm the JVM/session on a tiny file so we time the pipeline, not startup
    convert(spark, src, f"{tmp}/warm", mode="none")
    t0 = time.perf_counter()
    convert(spark, src, f"{tmp}/spark_out", mode="global")
    t_spark = time.perf_counter() - t0
    t0 = time.perf_counter()
    convert(spark, src, f"{tmp}/spark_out2", mode="cluster")
    t_cluster = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_records": n,
                "pyarrow_single_node_sec": round(t_arrow, 2),
                "spark_convert_global_sec": round(t_spark, 2),
                "spark_convert_cluster_sec": round(t_cluster, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
