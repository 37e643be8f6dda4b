"""Clustered-corpus scale probe (VERDICT r9 ask #3).

Every sfx1/sfx10 ratio in ARCHITECTURE §3b is measured on the driver's
near-uniform embeddings, where the seed quantizer is naturally balanced
— but the seed quantizer's failure mode is CLUSTERED data, where cell
skew is exactly what pushes the two-level family's ~n^1.25 routing
toward n^1.5.  This probe measures the family ON the clustered shape
(tests/clustered_fixture.py's skewed Gaussian blobs) at pytest scale
(n=2k) and probe scale (n=20k, the sf0.1-equivalent corpus size), under
BOTH quantizers:

- layout balance (x228's max cell population, seed vs Lloyd),
- routing cost (x217 wall time) and its 10x-growth ratio,
- end-to-end search recall@5 vs brute-force truth through the two
  REGISTERED search paths (x21 = seed, x230 = Lloyd-refined) at equal
  probe budget, with wall times and growth ratios.

Round 11 adds ``--beam`` (VERDICT r10 ask #4): the x248 beam-search
serve's hit rate on the SKEWED shape, walked over BOTH registered
graphs (x238 base, x249 multi-probe) — greedy graph walks are exactly
what hubness bends, and the uniform fixture alone cannot show it.

Usage:
    python scripts/clustered_probe.py [--runs N] [--ns 2000,20000] [--beam]
Prints one JSON object; stderr carries progress.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TIMED = [
    "x217_two_level_router",
    "x228_refined_quantizer",
    "x21_ivf_ann",
    "x230_refined_ivf_search",
]


def _exact_truth(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from json_to_parquet_spark.queries.similarity import (
        FANN_TOPK,
        N_QUERY_VECS,
        cosine,
    )
    from json_to_parquet_spark.sources.catalog import load_table

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


def _beam_truth(spark, sf_dir):
    """Exact top-GBS_K ids per beam query (x248's truth definition)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from json_to_parquet_spark.queries.graph_ssl import (
        GBS_K,
        GBS_NQ,
        cosine,
    )
    from json_to_parquet_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < GBS_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    rows = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("v")).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GBS_K)
        .select("q_id", "vec_id")
        .collect()
    )
    return {(r.q_id, r.vec_id) for r in rows}


def beam_section(spark, sf_dir, runs: int) -> dict:
    """x248's serve walked over BOTH registered graphs on this fixture:
    hit rate vs exact truth + serve wall (min-of-runs).  The multiprobe
    walk serves from x249's build-once store (its build cost is the
    probe's x249_build row, not charged to the serve)."""
    from json_to_parquet_spark.queries.graph_ssl import (
        GBS_K,
        GBS_NQ,
        beam_serve,
        knn2_graph_path,
        knn_edges,
    )

    truth = _beam_truth(spark, sf_dir)
    out: dict = {}
    for tag in ("base", "multiprobe"):
        def edges_of():
            if tag == "multiprobe":
                return spark.read.parquet(knn2_graph_path(spark, sf_dir))
            return knn_edges(spark, sf_dir)

        got = (
            beam_serve(spark, sf_dir, edges=edges_of())
            .select("q_id", "vec_id")
            .collect()
        )
        hits = sum((r.q_id, r.vec_id) in truth for r in got)
        best = None
        for _ in range(runs):
            t0 = time.time()
            beam_serve(spark, sf_dir, edges=edges_of()).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[tag] = {
            "hit_rate": round(hits / (GBS_K * GBS_NQ), 4),
            "served": len(got),
            "serve_s": round(best, 3),
        }
        print(f"beam {tag}: {out[tag]}", file=sys.stderr)
    return out


def _live_beam_truth(spark, sf_dir):
    """Exact top-GBS_K among LIVE vectors per beam query — the truth a
    deletion-correct serve must match (x262's truth definition)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from json_to_parquet_spark.queries.graph_ssl import (
        GBS_K,
        GBS_NQ,
        cosine,
    )
    from json_to_parquet_spark.queries.similarity import TOMB_MOD
    from json_to_parquet_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < GBS_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    rows = (
        emb.filter(F.col("vec_id") % TOMB_MOD != 2)
        .crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("v")).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GBS_K)
        .select("q_id", "vec_id")
        .collect()
    )
    return {(r.q_id, r.vec_id) for r in rows}


def tomb_section(spark, sf_dir, runs: int) -> dict:
    """VERDICT r11 ask #4: the graph DELETE edge on the skewed shape
    with deletions concentrated in the dominant blob — (a) x262's
    serve-AROUND (dead nodes stay waypoints, filtered from results)
    and (b) serve over the x263-COMPACTED graph (hot cells re-rung
    live-only), both audited against the live-only exact truth."""
    import time as _t

    from pyspark.sql import functions as F

    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.queries.graph_ssl import (
        GBS_K,
        GBS_NQ,
        beam_serve,
        x263_graph_tombstone_compact,
    )
    from json_to_parquet_spark.queries.similarity import TOMB_MOD

    reg = registry()
    truth = _live_beam_truth(spark, sf_dir)
    out: dict = {}

    # (a) serve-around: x262's gate output carries per-row hit flags
    def serve_around():
        return reg["x262_graph_tombstone_serve"].spark(spark, sf_dir).collect()

    rows = serve_around()
    best = None
    for _ in range(runs):
        t0 = _t.time()
        serve_around()
        best = min(best or 1e9, _t.time() - t0)
    out["serve_around"] = {
        "hit_rate": round(sum(r.hit for r in rows) / (GBS_K * GBS_NQ), 4),
        "served": len(rows),
        "serve_s": round(best, 3),
    }
    print(f"tomb serve_around: {out['serve_around']}", file=sys.stderr)

    # (b) compact-then-serve: walk the x263-compacted edges (compaction
    # paid once — the edges frame is checkpointed before timing)
    comp = (
        x263_graph_tombstone_compact(spark, sf_dir)
        .select("src_id", "dst_id")
        .localCheckpoint()
    )
    n_edges = comp.count()

    def serve_comp():
        return (
            beam_serve(spark, sf_dir, edges=comp)
            .filter(F.col("vec_id") % TOMB_MOD != 2)
            .select("q_id", "vec_id")
            .collect()
        )

    got = serve_comp()
    best = None
    for _ in range(runs):
        t0 = _t.time()
        serve_comp()
        best = min(best or 1e9, _t.time() - t0)
    out["compacted"] = {
        "hit_rate": round(
            sum((r.q_id, r.vec_id) in truth for r in got)
            / (GBS_K * GBS_NQ),
            4,
        ),
        "served": len(got),
        "edges": n_edges,
        "serve_s": round(best, 3),
    }
    print(f"tomb compacted: {out['compacted']}", file=sys.stderr)
    return out


def run(ns: list[int], runs: int, beam: bool = False, tomb: bool = False) -> None:
    from clustered_fixture import write_clustered_embeddings

    from json_to_parquet_spark.queries import registry
    from json_to_parquet_spark.queries.similarity import (
        FANN_TOPK,
        N_QUERY_VECS,
    )
    from json_to_parquet_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="clustered_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    reg = registry()
    out: dict = {"runs": runs, "sizes": {}}
    for n in ns:
        d = write_clustered_embeddings(
            "/tmp/clustered_fx", n=n, concentrate_deletes=tomb
        )
        row: dict = {}
        if tomb:
            out["sizes"][str(n)] = {"tomb": tomb_section(spark, d, runs)}
            continue
        if beam:
            out["sizes"][str(n)] = {"beam": beam_section(spark, d, runs)}
            continue
        # balance facts under both quantizers (x228's measured columns)
        stats = {
            r.quantizer: r
            for r in reg["x228_refined_quantizer"].spark(spark, d).collect()
        }
        row["max_pop"] = {q: s.max_pop for q, s in stats.items()}
        row["sq_err"] = {q: s.sq_err for q, s in stats.items()}
        row["n_cells"] = stats["seed"].n_cells_used
        # end-to-end recall through the registered search paths
        truth = _exact_truth(spark, d)
        for tag, name in (("seed", "x21_ivf_ann"), ("lloyd", "x230_refined_ivf_search")):
            got = reg[name].spark(spark, d).select("q_id", "vec_id").collect()
            hits = sum((r.q_id, r.vec_id) in truth for r in got)
            row.setdefault("recall", {})[tag] = round(
                hits / (FANN_TOPK * N_QUERY_VECS), 4
            )
        # wall times, min-of-runs
        for name in TIMED:
            best = None
            for _ in range(runs):
                t0 = time.time()
                reg[name].spark(spark, d).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row.setdefault("sec", {})[name] = round(best, 3)
            print(f"n={n} {name}: {best:.3f}s", file=sys.stderr)
        out["sizes"][str(n)] = row
    if len(ns) == 2 and not beam and not tomb:
        lo, hi = str(ns[0]), str(ns[1])
        out["ratio"] = {
            name: round(
                out["sizes"][hi]["sec"][name] / out["sizes"][lo]["sec"][name],
                2,
            )
            for name in TIMED
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--ns", type=str, default="2000,20000")
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--tomb", action="store_true")
    args = ap.parse_args()
    run(
        [int(x) for x in args.ns.split(",")],
        args.runs,
        beam=args.beam,
        tomb=args.tomb,
    )
