"""Multimodal columns (SURVEY §2.C X5): opaque binary payloads + typed
metadata structs, content-hash dedup, and the decode/feature-extract
plumbing as Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked stub (operators/media.py) — but everything Spark-side is
real: BinaryType schema, batch iteration, per-partition processing,
metadata struct construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.media import FRAME_BYTES
from ..sources.catalog import load_table
from . import QuerySpec, register


def x14_multimodal_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model a blob store: text bytes as the opaque payload (stand-in for
    image/audio bytes) + typed metadata + content hash for dedup."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
        F.concat(F.lit("doc/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("uri"),
        F.lit("text/plain").alias("mime"),
    )


register(
    QuerySpec(
        "x14_multimodal_catalog",
        x14_multimodal_catalog,
        """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS content_sha256,
               concat('doc/', source, '/', CAST(doc_id AS VARCHAR)) AS uri,
               'text/plain' AS mime
        FROM documents
        """,
        "binary payload catalog: sizes, content hashes, URIs, mime metadata",
    )
)


def x15_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup over binary payloads (doubled corpus →
    every payload has 2 copies): group by sha256, keep min id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    sha = F.sha2(F.encode(F.col("text"), "UTF-8"), 256)
    return (
        doubled.select("doc_id", sha.alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def x30_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads through the real
    Arrow-batched ``mapInPandas`` plumbing (operators/media.py), with the
    deterministic stand-in kernel (sha256-derived dims) in place of the
    absent codec — the kernel's arithmetic is SQL-expressible, so the
    whole Python-stage pipeline is oracle-checked, not just row-counted.
    At 100 TB the stage is embarrassingly parallel: no shuffle, one
    Python worker per partition, whole Arrow batches across the boundary."""
    from ..operators.media import documents_as_media, extract_media_features, fake_decode

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(documents_as_media(docs), decode=fake_decode)
    return feats.select(
        "doc_id",
        "n_bytes",
        "sha256",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
    )


register(
    QuerySpec(
        "x30_media_features",
        x30_media_features,
        """
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256,
               CAST(CAST(concat('0x', substr(sha256(text), 1, 2)) AS INTEGER) + 1 AS BIGINT) AS width,
               CAST(CAST(concat('0x', substr(sha256(text), 3, 2)) AS INTEGER) + 1 AS BIGINT) AS height,
               CAST((CAST(concat('0x', substr(sha256(text), 5, 2)) AS INTEGER) % 4) + 1 AS BIGINT) AS channels
        FROM documents
        """,
        "media feature extraction through mapInPandas (deterministic kernel, oracle-checked)",
    )
)


def x38_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas with VARIABLE-cardinality output
    (one payload → N frame rows) — the video/audio chunking shape. The
    fixed-stride splitter + md5 stand-in kernel is SQL-expressible
    (payloads are ASCII text bytes, so char slicing == byte slicing), so
    the exploding Python stage is value-checked end-to-end."""
    from ..operators.media import documents_as_media, extract_frames

    docs = load_table(spark, sf_dir, "documents")
    return extract_frames(documents_as_media(docs))


register(
    QuerySpec(
        "x38_media_frames",
        x38_media_frames,
        f"""
        WITH f AS (
          SELECT doc_id,
                 unnest(range(0, CAST(greatest(1, ceil(strlen(text) / {FRAME_BYTES}.0))
                                      AS BIGINT)))
                     AS frame_idx
          FROM documents),
        c AS (
          SELECT f.doc_id, f.frame_idx,
                 substr(d.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                        {FRAME_BYTES}) AS chunk
          FROM f JOIN documents d USING (doc_id))
        SELECT doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(length(chunk) AS BIGINT) AS frame_len,
               md5(chunk) AS frame_md5
        FROM c
        """,
        "frame sampling: 1→N mapInPandas chunking, value-checked via chunk md5",
    )
)


register(
    QuerySpec(
        "x15_binary_dedup",
        x15_binary_dedup,
        """
        WITH doubled AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents)
        SELECT sha256(text) AS content_sha256,
               MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM doubled GROUP BY sha256(text)
        """,
        "content-addressed binary dedup via sha256",
    )
)


# --- x117: byte-budget media shard packing -----------------------------------
# The WebDataset/tar-shard layout step for multimodal training data:
# blobs pack into fixed-byte-budget shards in deterministic doc order,
# via x27's two-phase prefix sum (range partition → partition-local
# running byte sums → tiny offsets frame broadcast back) — never a
# global single-partition window. Each shard's manifest row carries an
# md5 over its members' content hashes in doc order, so the gate proves
# the exact shard membership, not just counts. At 100 TB the shard
# writer consumes exactly this frame, one task per shard directory.
MEDIA_SHARD_BYTES = 16_384


def x117_media_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cat = x14_multimodal_catalog(spark, sf_dir).select(
        "doc_id", "n_bytes", "content_sha256"
    )
    parts = cat.repartitionByRange(F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    wp = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("local_cum", F.sum("n_bytes").over(wp))
    totals = local.groupBy("pid").agg(F.sum("n_bytes").alias("tot"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("tot").over(wo), F.lit(0)).alias("offset")
    )
    assigned = local.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "n_bytes",
        "content_sha256",
        F.floor((F.col("local_cum") + F.col("offset") - 1) / MEDIA_SHARD_BYTES)
        .cast("long")
        .alias("shard_id"),
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "content_sha256"))
                        ),
                        lambda s: s.content_sha256,
                    ),
                    "",
                )
            ).alias("members_md5"),
        )
        .orderBy("shard_id")
    )


register(
    QuerySpec(
        "x117_media_shard_pack",
        x117_media_shard_pack,
        f"""
        WITH cat AS (
          SELECT doc_id,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 sha256(text) AS content_sha256
          FROM documents),
        a AS (
          SELECT doc_id, n_bytes, content_sha256,
                 CAST(floor((SUM(n_bytes) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                      / {MEDIA_SHARD_BYTES}) AS BIGINT) AS shard_id
          FROM cat)
        SELECT shard_id, COUNT(*) AS n_blobs,
               CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
               md5(string_agg(content_sha256, '' ORDER BY doc_id))
                   AS members_md5
        FROM a GROUP BY shard_id
        ORDER BY shard_id
        """,
        "byte-budget media shard packing with per-shard membership digests",
    )
)


def x133_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize through the real mapInPandas plumbing
    (operators/media.py resize_media) with the deterministic stand-in
    kernel: source dims come from the sha256-header fake decode (the x30
    contract) and the fit-into-64 output dims are pure integer
    arithmetic, so the branching Python stage — including which payloads
    get resized at all — is oracle-checked value-for-value.  Same scale
    posture as x30/x38: embarrassingly parallel, no shuffle."""
    from ..operators.media import documents_as_media, fake_decode, resize_media

    docs = load_table(spark, sf_dir, "documents")
    out = resize_media(documents_as_media(docs), decode=fake_decode)
    return out.select(
        "doc_id",
        F.col("src_width").cast("long").alias("src_width"),
        F.col("src_height").cast("long").alias("src_height"),
        F.col("out_width").cast("long").alias("out_width"),
        F.col("out_height").cast("long").alias("out_height"),
        "resized",
        "out_bytes",
        "resized_md5",
    )


register(
    QuerySpec(
        "x133_media_resize",
        x133_media_resize,
        """
        WITH d AS (
          SELECT doc_id, text,
                 CAST(concat('0x', substr(sha256(text), 1, 2)) AS INTEGER) + 1 AS sw,
                 CAST(concat('0x', substr(sha256(text), 3, 2)) AS INTEGER) + 1 AS sh
          FROM documents),
        r AS (
          SELECT doc_id, text, sw, sh,
                 CASE WHEN greatest(sw, sh) > 64
                      THEN greatest(1, (sw * 64) // greatest(sw, sh))
                      ELSE sw END AS ow,
                 CASE WHEN greatest(sw, sh) > 64
                      THEN greatest(1, (sh * 64) // greatest(sw, sh))
                      ELSE sh END AS oh
          FROM d)
        SELECT doc_id,
               CAST(sw AS BIGINT) AS src_width,
               CAST(sh AS BIGINT) AS src_height,
               CAST(ow AS BIGINT) AS out_width,
               CAST(oh AS BIGINT) AS out_height,
               greatest(sw, sh) > 64 AS resized,
               CAST(least(strlen(text), ow * oh) AS BIGINT) AS out_bytes,
               md5(substr(text, 1, CAST(ow * oh AS BIGINT))) AS resized_md5
        FROM r
        """,
        "aspect-preserving media resize through mapInPandas (oracle-checked)",
    )
)


# --- x187: frame-level media dedup -------------------------------------------
FD_HALF_OFF = 200_000  # id offset: first-half-frames re-encode
FD_CORRUPT_OFF = 300_000  # id offset: one-frame-corrupted copy
FD_MIN_CONTAIN = 0.5
# Hot-frame cap (VERDICT r5): a frame hash with more than FD_MAX_DF
# occurrences corpus-wide (black frames, silence, intro cards — corpus-
# sized copy counts in real media) is dropped from PAIR GENERATION, so
# the frame_md5 self-join fans out at most FD_MAX_DF² per frame
# independent of corpus size — the x125 posting-df treatment applied to
# frames.  Denominators keep FULL frame counts, so containment over the
# surviving frames is a lower bound (capped pairs can only lose shared
# frames, never gain).
FD_MAX_DF = 8


def x187_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level media near-dup: chunk every payload into fixed-stride
    frames through the REAL mapInPandas splitter (x38's plumbing), then
    find media pairs sharing frames by content hash — the
    shared-frame containment pass video/audio dedup runs (a shortened
    or partially-corrupted re-encode shares most frames with its
    source even though the whole-file hash differs, which is exactly
    what x15's binary dedup cannot see). The corpus is augmented with
    two deterministic re-encode families: a first-half truncation
    (containment 1.0 from the copy side) and a first-frame corruption
    (containment (n-1)/n), so the containment spectrum is real.

    Shapes: frame explosion is the x38 map stage (no shuffle); the pair
    join keys on frame_md5 with frames above FD_MAX_DF occurrences
    dropped first (see FD_MAX_DF — the hot-key guard that keeps the
    self-join linear when a frame's copy count is corpus-sized); the
    rollup is pair-keyed. Output: pairs with containment ≥
    FD_MIN_CONTAIN.

    All slicing/counting is in BYTES (octet_length + binary substring
    on the encoded payload), matching the byte-stride splitter; the
    oracle's char-based slicing is byte-equivalent only because the
    documents corpus is pure ASCII — asserted by
    tests/test_round6_invariants.py::test_documents_corpus_is_ascii."""
    from ..operators.media import extract_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    n_frames = F.greatest(
        F.lit(1), F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES)))
    )
    half = (
        docs.filter(n_frames >= 2)
        .select(
            (F.col("doc_id") + FD_HALF_OFF).alias("doc_id"),
            F.substring(
                "payload", 1, (F.floor(n_frames / 2) * FRAME_BYTES).cast("int")
            ).alias("payload"),
        )
    )
    corrupt = docs.select(
        (F.col("doc_id") + FD_CORRUPT_OFF).alias("doc_id"),
        F.concat(
            F.encode(F.lit("#"), "UTF-8"), F.substring("payload", 2, 1 << 30)
        ).alias("payload"),
    )
    media = docs.unionAll(half).unionAll(corrupt)
    frames = extract_frames(media).select("doc_id", "frame_md5").persist()
    counts = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    cold = (
        frames.groupBy("frame_md5")
        .agg(F.count(F.lit(1)).alias("fdf"))
        .filter(F.col("fdf") <= FD_MAX_DF)
        .select("frame_md5")
    )
    joinable = frames.join(cold, "frame_md5")
    a = joinable.select(F.col("doc_id").alias("id_a"), "frame_md5")
    b = joinable.select(F.col("doc_id").alias("id_b"), "frame_md5")
    shared = (
        a.join(b, "frame_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
    )
    ca = counts.select(F.col("doc_id").alias("id_a"), F.col("n_frames").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("id_b"), F.col("n_frames").alias("n_b"))
    out = (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_frames",
            F.round(
                F.col("shared_frames").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= FD_MIN_CONTAIN)
        .orderBy("id_a", "id_b")
    )
    return out


register(
    QuerySpec(
        "x187_frame_dedup",
        x187_frame_dedup,
        # Char-based slicing (substr/strlen) is byte-equivalent to the
        # engine's byte-stride frames ONLY on ASCII text — precondition
        # asserted by test_round6_invariants.py::test_documents_corpus_is_ascii.
        f"""
        WITH base AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {FD_HALF_OFF},
                 substr(text, 1,
                        CAST(floor(greatest(1, ceil(strlen(text) / {FRAME_BYTES}.0)) / 2)
                             * {FRAME_BYTES} AS BIGINT))
          FROM documents
          WHERE greatest(1, ceil(strlen(text) / {FRAME_BYTES}.0)) >= 2
          UNION ALL
          SELECT doc_id + {FD_CORRUPT_OFF}, '#' || substr(text, 2)
          FROM documents),
        f AS (
          SELECT doc_id,
                 unnest(range(0, CAST(greatest(1, ceil(strlen(text) / {FRAME_BYTES}.0))
                                      AS BIGINT))) AS frame_idx
          FROM base),
        frames AS MATERIALIZED (
          SELECT f.doc_id,
                 md5(substr(b.text, CAST(f.frame_idx * {FRAME_BYTES} + 1 AS BIGINT),
                            {FRAME_BYTES}))
                     AS frame_md5
          FROM f JOIN base b USING (doc_id)),
        counts AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
          FROM frames GROUP BY doc_id),
        cold AS (
          SELECT frame_md5 FROM frames
          GROUP BY frame_md5 HAVING COUNT(*) <= {FD_MAX_DF}),
        joinable AS MATERIALIZED (
          SELECT f.doc_id, f.frame_md5
          FROM frames f JOIN cold USING (frame_md5)),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(COUNT(*) AS BIGINT) AS shared_frames
          FROM joinable a JOIN joinable b
            ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT s.id_a, s.id_b, s.shared_frames,
               ROUND(CAST(s.shared_frames AS DOUBLE)
                     / least(ca.n_frames, cb.n_frames), 6) AS containment
        FROM shared s
        JOIN counts ca ON ca.doc_id = s.id_a
        JOIN counts cb ON cb.doc_id = s.id_b
        WHERE CAST(s.shared_frames AS DOUBLE)
              / least(ca.n_frames, cb.n_frames) >= {FD_MIN_CONTAIN}
        ORDER BY s.id_a, s.id_b
        """,
        "frame-level media dedup: shared-frame containment across re-encodes",
    )
)
