"""Semantic invariants for the round-10 additions (beyond oracle parity).

VERDICT r9 asked to (1) wire the Lloyd-refined quantizer into a real
search consumer and prove, on the clustered fixture, that the refined
search loses no recall at equal probe budget while scanning the
better-balanced layout, and (2) make x227's compaction rewrite
incremental — hot cells' partitions rewritten, cold cells' files
byte-untouched.  These tests pin the facts the oracles cannot express:
end-to-end recall through the REGISTERED search paths, and file-level
physical (non-)movement across a compaction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from json_to_parquet_spark.queries import registry
from json_to_parquet_spark.sources.catalog import load_table


def _clustered_dir():
    import sys

    sys.path.insert(0, "tests")
    from clustered_fixture import write_clustered_embeddings

    return write_clustered_embeddings("/tmp/clustered_fx", n=2000)


def _exact_truth(spark, sf_dir):
    """Brute-force top-FANN_TOPK per query — the shared ground truth both
    searches are scored against (bounded: N_QUERY_VECS × corpus)."""
    from json_to_parquet_spark.queries.similarity import (
        FANN_TOPK,
        N_QUERY_VECS,
        cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    rows = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("embedding")).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= FANN_TOPK)
        .select("q_id", "vec_id")
        .collect()
    )
    return {(r.q_id, r.vec_id) for r in rows}


def _search_recall(spark, sf_dir, name, truth):
    from json_to_parquet_spark.queries.similarity import (
        FANN_TOPK,
        N_QUERY_VECS,
    )

    rows = registry()[name].spark(spark, sf_dir).select("q_id", "vec_id").collect()
    hits = sum((r.q_id, r.vec_id) in truth for r in rows)
    return hits / (FANN_TOPK * N_QUERY_VECS)


def test_refined_search_recall_holds_on_clustered_data(spark):
    """The VERDICT r9 ask-#1 end-to-end law: the REGISTERED refined-
    quantizer search (x230) must match-or-beat the REGISTERED seed-
    quantizer search (x21) on recall at the same probe budget, on the
    clustered corpus where x228 measured the seed layout degrading
    (measured here: 1.0 vs 1.0 — tight blobs, 2 probes)."""
    d = _clustered_dir()
    truth = _exact_truth(spark, d)
    recall_seed = _search_recall(spark, d, "x21_ivf_ann", truth)
    recall_lloyd = _search_recall(spark, d, "x230_refined_ivf_search", truth)
    assert recall_lloyd >= recall_seed, (recall_lloyd, recall_seed)
    assert recall_lloyd >= 0.9, recall_lloyd


def test_refined_search_scans_balanced_layout(spark):
    """x230's routing (the exact frames the search consumes) must carry
    the balance win x228 measured: the largest inverted list under the
    Lloyd-refined quantizer is strictly smaller than under the seed
    quantizer (345 → 211 on this fixture), while conserving every
    vector.  This is the scale fact that makes x230 the better search
    at 100 TB — candidate-scan cost is bounded by the largest probed
    list."""
    from json_to_parquet_spark.queries.similarity import (
        _quantizer_frames,
        cent_sup_for,
        route_two_level,
    )

    d = _clustered_dir()
    corpus, sup, cent_seed, cent_lloyd, nlist = _quantizer_frames(spark, d)

    def pops(cent):
        lists = route_two_level(
            corpus, sup, cent_sup_for(cent, sup), cent_rows=nlist
        )
        row = (
            lists.groupBy("c_id")
            .count()
            .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
            .collect()[0]
        )
        return row.mx, row.n

    seed_max, seed_n = pops(cent_seed)
    lloyd_max, lloyd_n = pops(cent_lloyd)
    assert lloyd_max < seed_max, (lloyd_max, seed_max)
    assert seed_n == lloyd_n == 2000


def _file_hashes(root):
    """{relative_path: sha256} over every data file under ``root``,
    excluding Spark's job-level marker files (recreated per write)."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
    return out


def test_x227_compaction_is_incremental(spark, sf_dir, tmp_path):
    """VERDICT r9 ask #2: the compaction rewrite must be INCREMENTAL —
    after phase 1 (uncompacted layout) and phase 2 (compact hot cells),
    every COLD cell's data files are byte-identical to their phase-1
    state (same names, same content hashes: dynamic partition overwrite
    never touched their directories), while every HOT cell's partition
    was physically replaced and carries zero dead rows.  No live row is
    lost anywhere."""
    from json_to_parquet_spark.queries.similarity import (
        TOMB_PCT,
        _tomb_compact_hot,
        _tomb_placed,
        _tomb_write_base,
    )

    dest = str(tmp_path / "tomb_idx")
    _tomb_write_base(spark, sf_dir, dest)
    before = _file_hashes(dest)

    placed = _tomb_placed(spark, sf_dir)
    pre = {
        r.cell: (r.n_dead, r.n_total)
        for r in placed.groupBy("cell")
        .agg(
            F.sum(F.col("dead").cast("long")).alias("n_dead"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .collect()
    }
    hot = {c for c, (d, t) in pre.items() if d * 100 > t * TOMB_PCT}
    assert hot and set(pre) - hot, "fixture must have both hot and cold cells"

    _tomb_compact_hot(spark, sf_dir, dest)
    after = _file_hashes(dest)

    def cell_of(relpath):
        part = relpath.split("/")[0]
        assert part.startswith("cell=")
        return int(part.split("=", 1)[1])

    cold_before = {p: h for p, h in before.items() if cell_of(p) not in hot}
    cold_after = {p: h for p, h in after.items() if cell_of(p) not in hot}
    assert cold_before == cold_after  # cold files byte-untouched
    hot_before = {p for p in before if cell_of(p) in hot}
    hot_after = {p for p in after if cell_of(p) in hot}
    assert hot_before.isdisjoint(hot_after)  # hot partitions replaced

    idx = spark.read.parquet(dest)
    post = {
        r.cell: (r.n_dead, r.n_total)
        for r in idx.groupBy("cell")
        .agg(
            F.sum(F.col("dead").cast("long")).alias("n_dead"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .collect()
    }
    for cell, (d, t) in pre.items():
        pd_, pt = post[cell]
        if cell in hot:
            assert pd_ == 0 and pt == t - d, (cell, post[cell])
        else:
            assert (pd_, pt) == (d, t), (cell, post[cell])
