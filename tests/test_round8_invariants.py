"""Semantic invariants for the round-8 additions (beyond oracle parity).

VERDICT r7 asked for the √n cell-count rule family-wide (ask #4), a
registered two-level quantizer composition (ask #6), and a selectivity
sweep for the filtered-ANN shape (ask #5); these tests pin the
structural facts the oracles can't express — conservation laws of the
two-level routing and the nestedness of the selectivity levels.
"""

from __future__ import annotations

import duckdb

from json_to_parquet_spark.queries import registry


def test_x217_routing_conservation(spark, sf_dir):
    """Every fine cell is routed to exactly one super-cell and every
    corpus vector lands in exactly one fine cell: sum(n_cells) == nlist
    and sum(n_vecs) == n over the per-super rollup."""
    from json_to_parquet_spark.queries.similarity import ivf_k0, ivf_nlist

    rows = registry()["x217_two_level_router"].spark(spark, sf_dir).collect()
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    assert len(rows) == ivf_k0(spark, sf_dir)
    assert sum(r.n_cells for r in rows) == ivf_nlist(spark, sf_dir)
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert 0 <= r.min_cell_pop <= r.max_cell_pop <= r.n_vecs


def test_x218_selectivity_levels_are_nested(spark, sf_dir):
    """'tenth' (label equality) implies 'half' (label parity) implies
    'all', so per query the candidate pool must shrink monotonically as
    the predicate tightens, and hits never exceed the top-k."""
    from json_to_parquet_spark.queries.similarity import FANN_TOPK, SEL_LEVELS

    rows = registry()["x218_filtered_ann_sweep"].spark(spark, sf_dir).collect()
    assert {r.sel for r in rows} == set(SEL_LEVELS)
    by_q: dict[int, dict[str, int]] = {}
    for r in rows:
        by_q.setdefault(r.q_id, {})[r.sel] = r.n_cand
        assert 0 <= r.hits <= FANN_TOPK
        assert abs(r.recall_at_k - r.hits / FANN_TOPK) < 1e-9
    for q_id, cands in by_q.items():
        assert cands["tenth"] <= cands["half"] <= cands["all"], (q_id, cands)


def test_two_level_lists_cover_corpus_once(spark, sf_dir):
    """The shared two-level assignment is a partition of the corpus:
    one list id per vector, list ids drawn from the first-nlist block."""
    from json_to_parquet_spark.queries.similarity import (
        ivf_nlist,
        two_level_lists,
    )

    rows = two_level_lists(spark, sf_dir).collect()
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    nlist = ivf_nlist(spark, sf_dir)
    assert all(0 <= r.list_c < nlist for r in rows)


def test_x219_recall_monotone_in_nprobe(spark, sf_dir):
    """Candidate sets are nested in nprobe (a vector's list either is or
    isn't among the top-p probes), so n_cand is non-decreasing — and so
    is recall@k: a new candidate displaces a true top-k hit only by
    out-ranking it on cosine, making the new candidate a true top-k
    member itself."""
    from json_to_parquet_spark.queries.similarity import NPROBE_LEVELS

    rows = registry()["x219_nprobe_sweep"].spark(spark, sf_dir).collect()
    assert {r.nprobe for r in rows} == set(NPROBE_LEVELS)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r.nprobe)
        cands = [r.n_cand for r in rs]
        recalls = [r.recall_at_k for r in rs]
        assert cands == sorted(cands), (q_id, cands)
        assert recalls == sorted(recalls), (q_id, recalls)


def test_x220_maintenance_ledger_conserves(spark, sf_dir):
    """The maintenance ledger is a partition of the corpus: totals sum
    to n, added sums to the deterministic batch size, every row balances
    base+added=total, and every split cell contributes exactly two sub
    rows whose merged population exceeded the split threshold."""
    import math

    from json_to_parquet_spark.queries.similarity import (
        ADD_MOD,
        ivf_nlist,
    )

    rows = (
        registry()["x220_ivf_incremental_maintenance"]
        .spark(spark, sf_dir)
        .collect()
    )
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    (n_add,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id % {ADD_MOD} = {ADD_MOD - 1}"
    ).fetchone()
    split_t = 2 * math.ceil(n / ivf_nlist(spark, sf_dir))
    assert sum(r.n_total for r in rows) == n
    assert sum(r.n_added for r in rows) == n_add
    by_cell: dict[int, list] = {}
    for r in rows:
        assert r.n_base + r.n_added == r.n_total
        by_cell.setdefault(r.cell, []).append(r)
    for cell, rs in by_cell.items():
        subs = sorted(r.sub for r in rs)
        if subs == [0]:
            assert rs[0].n_total <= split_t
        else:
            assert subs == [1, 2], (cell, subs)
            assert sum(r.n_total for r in rs) > split_t


def test_x221_zorder_beats_linear_on_2d_boxes(spark, sf_dir):
    """Conservation: the quartile boxes partition the key space, so
    matched rows sum to the table; per box a stats-pruned scan reads
    between 1 and 64 files when rows match; and across the whole grid
    the z-order layout must read FEWER file envelopes than the linear
    sort — the property the layout exists to buy (tight min/max on both
    keys instead of one)."""
    rows = registry()["x221_zorder_pruning"].spark(spark, sf_dir).collect()
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    assert sum(r.rows_matched for r in rows) == n
    for r in rows:
        if r.rows_matched:
            assert 1 <= r.files_read_z <= 64
            assert 1 <= r.files_read_lin <= 64
    assert sum(r.files_read_z for r in rows) < sum(
        r.files_read_lin for r in rows
    )


def test_x222_keeps_exactly_the_distinct_chunks(spark, sf_dir):
    """Keep-first is a bijection onto the distinct chunk set: the kept
    total must equal the number of DISTINCT chunk strings in the corpus
    (computed independently here), and no doc keeps more than it had."""
    from json_to_parquet_spark.queries.curation import CHUNK_W

    rows = registry()["x222_chunk_dedup_rebuild"].spark(spark, sf_dir).collect()
    (n_distinct,) = duckdb.sql(f"""
        SELECT COUNT(DISTINCT array_to_string(
                   toks[t.i * {CHUNK_W} + 1 : (t.i + 1) * {CHUNK_W}], ' '))
        FROM (SELECT string_split(lower(text), ' ') AS toks
              FROM '{sf_dir}/documents.parquet') d,
             LATERAL (SELECT unnest(range(0,
                 CAST(CEIL(len(toks) * 1.0 / {CHUNK_W}) AS BIGINT))) AS i) t
        """).fetchone()
    assert sum(r.n_kept for r in rows) == n_distinct
    for r in rows:
        assert 0 <= r.n_kept <= r.n_chunks


def test_x224_tombstone_ledger_conserves(spark, sf_dir):
    """live+dead partitions the corpus; dead total equals the
    deterministic tombstone-set size; reclaimed is exactly the dead rows
    of compacting cells."""
    from json_to_parquet_spark.queries.similarity import TOMB_MOD, TOMB_PCT

    rows = registry()["x224_tombstone_compaction"].spark(spark, sf_dir).collect()
    (n,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    (n_dead,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id % {TOMB_MOD} = 2"
    ).fetchone()
    assert sum(r.n_live + r.n_dead for r in rows) == n
    assert sum(r.n_dead for r in rows) == n_dead
    for r in rows:
        expect = r.n_dead * 100 > (r.n_live + r.n_dead) * TOMB_PCT
        assert r.needs_compact == int(expect)
        assert r.reclaimed == (r.n_dead if expect else 0)


def test_x225_mwu_weights_monotone_in_loss(spark, sf_dir):
    """The MWU update is order-preserving: a domain with strictly higher
    loss can never end with a lower weight; the renormalized weights sum
    to SCALE within the |domains|-ulp floor drift."""
    from json_to_parquet_spark.queries.modeling import DOREMI_SCALE

    rows = registry()["x225_doremi_mix"].spark(spark, sf_dir).collect()
    total = sum(r.w_final_micro for r in rows)
    assert DOREMI_SCALE - len(rows) <= total <= DOREMI_SCALE
    by_loss = sorted(rows, key=lambda r: (r.loss_micro, r.source))
    for a, b in zip(by_loss, by_loss[1:]):
        if b.loss_micro > a.loss_micro:
            assert b.w_final_micro >= a.w_final_micro, (a, b)


def test_x226_ivm_matches_final_state_cardinality(spark, sf_dir):
    """The incremental view's row total must equal the merged final
    state's cardinality (base − deletes + inserts), computed
    independently here; the oracle hash match proves the sums."""
    from json_to_parquet_spark.queries.pipeline import (
        IVM_DEL_MOD,
        IVM_INS_MOD,
    )

    rows = (
        registry()["x226_incremental_view_maintenance"]
        .spark(spark, sf_dir)
        .collect()
    )
    (n_final,) = duckdb.sql(
        f"""SELECT COUNT(*) FROM '{sf_dir}/lineitem.parquet'
            WHERE l_orderkey % {IVM_INS_MOD} = 7
               OR (l_orderkey % {IVM_INS_MOD} != 7
                   AND l_orderkey % {IVM_DEL_MOD} != 4)"""
    ).fetchone()
    assert sum(r.n_rows for r in rows) == n_final
    assert all(r.n_rows > 0 for r in rows)
