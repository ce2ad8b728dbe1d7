"""Sub-document (chunk-level) exact deduplication.

Document-level dedup (datapipe/dedup.py) misses the dominant real-world
duplication mode: boilerplate passages repeated *inside* otherwise
distinct documents (headers, licenses, templated paragraphs).  Web-scale
pipelines (C4, RefinedWeb) therefore dedup at line/paragraph granularity.
The driver corpus has no paragraph separators, so the unit here is a
fixed-width token chunk — the same granularity a sequence-packing
pipeline emits anyway.

Plan shape (scale-first):
1. chunking is a pure array expression — ``sequence`` + ``slice`` +
   ``concat_ws`` builds the chunk array per row, then ONE ``posexplode``
   emits (doc_id, chunk_pos, chunk).  No per-token explode: the fan-out
   is n_tokens/width, ~20× smaller.
2. first-occurrence is ``min(occ_key) OVER (PARTITION BY digest)`` — a
   window, not a groupBy+self-join: one shuffle keyed on the digest and
   the chunk explode runs ONCE (the join formulation recomputes it on
   both branches — caught by ``test_chunk_dedup_single_posexplode``).
3. per-doc stats re-aggregate on doc_id (the pre-explode partitioning
   key, so with the repartition-before-explode pattern from
   datapipe/dedup.py this agg is shuffle-free at scale).

At 100 TB nothing here collects, broadcasts a large side, or carries text
through a shuffle — duplicated chunks are detected via digests only.
Counts are exact integers, so the gate hash is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table

__all__ = ["chunk_tokens", "chunk_dedup_stats", "chunk_dedup_apply"]

# First-occurrence keys are (doc_id, chunk_pos) STRUCTS compared
# lexicographically — NOT an arithmetic doc_id*BASE+chunk_pos packing,
# which silently aliases across docs once any doc has >= BASE chunks (or
# doc_id*BASE overflows int64).  Same pattern as dedup.exact_substring;
# DuckDB's struct_pack min mirrors Spark's struct min ordering exactly.
_OCC_SQL = "struct_pack(d := doc_id, p := chunk_pos)"


def _occ(id_col: str):
    from pyspark.sql import functions as _F

    return _F.struct(_F.col(id_col).alias("d"), _F.col("chunk_pos").alias("p"))


def chunk_tokens(
    docs: DataFrame,
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into fixed-width token chunks:
    (id, chunk_pos, chunk) with chunk = width consecutive tokens joined
    by single spaces (the final chunk may be shorter)."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_pos", "chunk")
    )


def chunk_dedup_stats(
    docs: DataFrame,
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document chunk-dedup decision: how many of the doc's chunks are
    corpus-wide first occurrences (kept) vs duplicates of an earlier
    (doc_id, chunk_pos) (dropped).  Keep-first policy is the global
    minimum of the (doc_id, chunk_pos) struct key, exactly like
    document-level ``dedup.py`` keep-first."""
    from pyspark.sql.window import Window

    ch = chunk_tokens(docs, width, text_col, id_col).select(
        F.col(id_col),
        F.col("chunk_pos"),
        F.md5(F.col("chunk")).alias("h"),
        _occ(id_col).alias("occ_key"),
    )
    keep = F.min("occ_key").over(Window.partitionBy("h"))
    return (
        ch.withColumn("keep_key", keep)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("occ_key") != F.col("keep_key")).cast("long")).alias(
                "n_dup_chunks"
            ),
        )
    )


def chunk_dedup_apply(
    docs: DataFrame,
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The transform itself: rebuild every document keeping only its
    corpus-wide first-occurrence chunks (duplicated boilerplate removed,
    original chunk order preserved).

    Reassembly sorts the per-doc (pos, chunk) pairs inside an array
    aggregate — ``sort_array(collect_list(struct(pos, chunk)))`` is
    deterministic where a bare ``collect_list`` is not — and the groupBy
    key is the same doc id the chunk stage is partitioned on.  Documents
    whose every chunk was boilerplate come back empty-string, not
    dropped: the decision stays visible downstream."""
    from pyspark.sql.window import Window

    ch = chunk_tokens(docs, width, text_col, id_col).select(
        F.col(id_col),
        F.col("chunk_pos"),
        F.col("chunk"),
        F.md5(F.col("chunk")).alias("h"),
        _occ(id_col).alias("occ_key"),
    )
    keep = F.min("occ_key").over(Window.partitionBy("h"))
    kept = ch.withColumn("keep_key", keep).filter(
        F.col("occ_key") == F.col("keep_key")
    )
    assembled = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("chunk_pos", "chunk"))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text")
        )
    )
    # left join back so fully-duplicate docs surface with empty text
    return docs.select(id_col).join(assembled, id_col, "left").select(
        id_col, F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )


# ---------------------------------------------------------------------------
# correctness-gate query
# ---------------------------------------------------------------------------


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return chunk_dedup_stats(d, width=20)


SQL_CHUNK_DEDUP = f"""
WITH ch AS (
  SELECT doc_id, chunk_pos,
         md5(chunk) AS h,
         {_OCC_SQL} AS occ_key
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)),
             i -> array_to_string(
                    list_slice(string_split(text, ' '), i * 20 + 1, i * 20 + 20),
                    ' '))) AS chunk,
           unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)))
             AS chunk_pos
    FROM documents
  )
), first AS (
  SELECT h, min(occ_key) AS keep_key FROM ch GROUP BY h
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN occ_key <> keep_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
FROM ch JOIN first USING (h)
GROUP BY doc_id
"""


def q_chunk_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = chunk_dedup_apply(d, width=20)
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_digest"),
        F.length("clean_text").alias("clean_len"),
    )


SQL_CHUNK_DEDUP_APPLY = f"""
WITH ch AS (
  SELECT doc_id, chunk_pos, chunk,
         md5(chunk) AS h,
         {_OCC_SQL} AS occ_key
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)),
             i -> array_to_string(
                    list_slice(string_split(text, ' '), i * 20 + 1, i * 20 + 20),
                    ' '))) AS chunk,
           unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)))
             AS chunk_pos
    FROM documents
  )
), first AS (
  SELECT h, min(occ_key) AS keep_key FROM ch GROUP BY h
), kept AS (
  SELECT doc_id, chunk_pos, chunk
  FROM ch JOIN first USING (h)
  WHERE occ_key = keep_key
), assembled AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       md5(coalesce(clean_text, '')) AS clean_digest,
       length(coalesce(clean_text, '')) AS clean_len
FROM documents d LEFT JOIN assembled a ON d.doc_id = a.doc_id
"""


QUERIES = {
    "dedup_chunks": (q_chunk_dedup, SQL_CHUNK_DEDUP),
    "dedup_chunks_apply": (q_chunk_dedup_apply, SQL_CHUNK_DEDUP_APPLY),
}


def q_pipeline_chunked_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end composition over the chunk layer: boilerplate removal
    (chunk_dedup_apply) → before/after token accounting → deterministic
    hash split assignment → per-(source, split) corpus stats, as ONE
    declarative plan.  This is the second flagship pipeline
    (text.q_corpus_pipeline composes the doc-level gates); it proves the
    chunk transform composes downstream without materialization."""
    from .sampling import assign_split
    from .text import token_count

    d = load_table(spark, sf_dir, "documents")
    cleaned = chunk_dedup_apply(d, width=20)
    stats = (
        d.select("doc_id", "source", token_count(F.col("text")).alias("tok_before"))
        .join(cleaned, "doc_id")
        .withColumn("tok_after", token_count(F.col("clean_text")))
    )
    s = assign_split(stats, "doc_id", {"train": 0.90, "val": 0.05, "test": 0.05})
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_before").alias("tokens_before"),
        F.sum("tok_after").alias("tokens_after"),
    )


def _sql_pipeline_chunked_corpus() -> str:
    # the SALTED split bucket (mirrors assign_split)
    b = (
        "CAST(concat('0x', substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))"
        " AS BIGINT) % 1000000"
    )
    t, v = int(0.90 * 1_000_000), int(0.95 * 1_000_000)
    return f"""
WITH ch AS (
  SELECT doc_id, chunk_pos, chunk,
         md5(chunk) AS h,
         {_OCC_SQL} AS occ_key
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)),
             i -> array_to_string(
                    list_slice(string_split(text, ' '), i * 20 + 1, i * 20 + 20),
                    ' '))) AS chunk,
           unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS INT)))
             AS chunk_pos
    FROM documents
  )
), kept AS (
  SELECT doc_id, chunk_pos, chunk
  FROM (SELECT *, min(occ_key) OVER (PARTITION BY h) AS keep_key FROM ch)
  WHERE occ_key = keep_key
), assembled AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_pos) AS clean_text
  FROM kept GROUP BY doc_id
), stats AS (
  SELECT d.doc_id, d.source,
         len(string_split(d.text, ' ')) AS tok_before,
         len(string_split(coalesce(a.clean_text, ''), ' ')) AS tok_after
  FROM documents d LEFT JOIN assembled a ON d.doc_id = a.doc_id
)
SELECT source,
       CASE WHEN {b} < {t} THEN 'train'
            WHEN {b} < {v} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(tok_before) AS BIGINT) AS tokens_before,
       CAST(sum(tok_after) AS BIGINT) AS tokens_after
FROM stats
GROUP BY 1, 2
"""


QUERIES["pipeline_chunked_corpus"] = (
    q_pipeline_chunked_corpus,
    _sql_pipeline_chunked_corpus(),
)


# ---------------------------------------------------------------------------
# Content-defined chunking (FastCDC/rsync-style, token granularity).
#
# Fixed-width chunking breaks on insertion: one added token shifts every
# downstream chunk boundary, so a near-identical doc shares almost no
# chunk digests with the original.  Content-defined boundaries are chosen
# by the DATA — a boundary lands after token i iff the rolling hash of
# the last CDC_W tokens hits a divisor condition — so an edit only
# perturbs the chunks it touches (the property every dedup store from
# rsync to LLM-corpus pipelines relies on; pinned by
# test_cdc_chunking_shift_resistant).
#
# Everything is linear-time JVM HOF expressions per doc: boundary
# positions via filter over the token index range, chunk spans via
# zip_with over (starts, ends) — no O(n^2) prefix scans, no explode until
# the chunks themselves (fan-out ~ n_tokens / avg_chunk).
# ---------------------------------------------------------------------------

CDC_W = 3  # rolling-gram width (tokens)
CDC_DIV = 4  # boundary divisor: P(boundary) = 1/4 -> ~4-token avg chunks
_CDC_PRIME = (1 << 31) - 1


_CDC_COMB = 1_000_003  # Horner base combining per-token hashes into a gram hash


def _tok_hash(t):
    """md5-derived per-token hash in [0, _CDC_PRIME)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % _CDC_PRIME


def _gram_hash_at(th_col, i):
    """Gram hash ending at 1-based pos i from PRE-COMPUTED token hashes:
    Horner fold over the CDC_W taps h[i-(CDC_W-1)..i], mod _CDC_PRIME at
    every step.  Each product is ≤ (P−1)·B ≈ 2^51 — int64-safe.  The old
    shape built the gram STRING (slice + concat) and md5'd it per index
    inside the interpreted boundary filter — hashing every token CDC_W
    times plus string machinery per index; this hashes each token once
    and does CDC_W multiply-adds per index (measured ~3× on the gate).
    The fold is GENERATED from CDC_W so tuning the gram width cannot
    silently diverge from the boundary semantics (round-4 review)."""
    # try_element_at: the clamped boundary sequence probes i = CDC_W even
    # for docs shorter than the gram width, and ANSI element_at raises on
    # out-of-bounds BEFORE the i < n conjunct can mask it (& does not
    # short-circuit).  NULL propagates through the fold and the boundary
    # filter drops it — same emptying the old out-of-range slice gave.
    h = lambda j: F.try_element_at(th_col, j)  # noqa: E731
    acc = h(i - (CDC_W - 1)) % _CDC_PRIME
    for off in range(CDC_W - 2, -1, -1):
        acc = (acc * _CDC_COMB + h(i - off)) % _CDC_PRIME
    return acc


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into content-defined chunks:
    (id, chunk_pos, chunk)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # stage 1: materialize the token array + per-token hashes (each token
    # hashed ONCE — see _gram_hash_at)
    hashed = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        F.transform(toks, _tok_hash).alias("_th"),
    )
    # boundary AFTER token i for i in [CDC_W, n-1] iff gram hash % DIV == 0.
    # The stop is clamped to >= CDC_W because Spark's sequence() DESCENDS
    # when stop < start (SURVEY §8 — it would fabricate i=CDC_W-1 with an
    # out-of-range slice); the i < n guard then empties short docs.
    bpos = F.filter(
        F.sequence(F.lit(CDC_W), F.greatest(F.col("_n") - 1, F.lit(CDC_W))),
        lambda i: (_gram_hash_at(F.col("_th"), i) % CDC_DIV == 0)
        & (i < F.col("_n")),
    )
    # stage 2: materialize bpos BELOW the Generate: the generator
    # expression references bpos twice (starts, ends) and HOF lambdas sit
    # outside codegen subexpression elimination — without this Project
    # boundary the boundary filter runs twice per doc (measured 2x)
    staged = hashed.select(
        F.col(id_col), F.col("_toks"), F.col("_n"), bpos.alias("_bpos")
    )
    starts = F.concat(F.array(F.lit(0)), F.col("_bpos"))
    ends = F.concat(F.col("_bpos"), F.array(F.col("_n")))
    chunks = F.zip_with(
        starts, ends,
        lambda s, e: F.concat_ws(" ", F.slice(F.col("_toks"), s + 1, e - s)),
    )
    return staged.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_pos", "chunk")
    )


def cdc_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document chunk-dedup stats over content-defined chunks — same
    first-occurrence keep rule (and the same single-posexplode + window
    plan shape) as :func:`chunk_dedup_stats`."""
    from pyspark.sql.window import Window

    ch = cdc_chunks(docs, text_col, id_col).select(
        F.col(id_col),
        F.col("chunk_pos"),
        F.md5(F.col("chunk")).alias("h"),
        _occ(id_col).alias("occ_key"),
    )
    keep = F.min("occ_key").over(Window.partitionBy("h"))
    return (
        ch.withColumn("keep_key", keep)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("occ_key") != F.col("keep_key")).cast("long")).alias(
                "n_dup_chunks"
            ),
        )
    )


def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return cdc_dedup_stats(d)


def _sql_cdc_chunk_dedup() -> str:
    P, B = _CDC_PRIME, _CDC_COMB
    # generated from CDC_W, mirroring _gram_hash_at's Horner fold
    ghash = f"th[i-{CDC_W - 1}] % {P}"
    for off in range(CDC_W - 2, -1, -1):
        tap = f"th[i-{off}]" if off else "th[i]"
        ghash = f"(({ghash}) * {B} + {tap}) % {P}"
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n,
         list_transform(string_split(text, ' '),
           x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % {P})
           AS th
  FROM documents
), b AS (
  SELECT doc_id, toks, n,
         list_filter(range({CDC_W}, greatest(n, {CDC_W})),
                     i -> ({ghash}) % {CDC_DIV} = 0) AS bpos
  FROM t
), spans AS (
  SELECT doc_id,
         list_prepend(0, bpos) AS starts,
         list_append(bpos, n) AS ends,
         toks
  FROM b
), ch AS (
  SELECT doc_id,
         unnest(range(1, len(starts) + 1)) - 1 AS chunk_pos,
         unnest(list_transform(range(1, len(starts) + 1),
                j -> array_to_string(toks[starts[j] + 1 : ends[j]], ' '))) AS chunk
  FROM spans
), hashed AS (
  SELECT doc_id, chunk_pos, md5(chunk) AS h,
         {_OCC_SQL} AS occ_key
  FROM ch
), first AS (
  SELECT h, min(occ_key) AS keep_key FROM hashed GROUP BY h
)
SELECT doc_id,
       count(*) AS n_chunks,
       CAST(sum(CASE WHEN occ_key <> keep_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks
FROM hashed JOIN first USING (h)
GROUP BY doc_id
"""


QUERIES["dedup_cdc_chunks"] = (q_cdc_chunk_dedup, _sql_cdc_chunk_dedup())


# ---------------------------------------------------------------------------
# Sliding-window (overlapping) chunking — the RAG / long-context variant
# of ``chunk_tokens``.  Fixed width W, stride S < W: consecutive windows
# share W - S tokens, so a retrieval index never splits an answer span
# across a hard boundary.  Same scale shape as chunk_tokens: the window
# array is built per row with pure array expressions (sequence +
# transform + slice) and ONE posexplode emits the windows — fan-out is
# n_tokens/S per doc, no per-token explode, nothing collected.
# ---------------------------------------------------------------------------

SLIDE_WIDTH = 24
SLIDE_STRIDE = 12


def sliding_chunks(
    docs: DataFrame,
    width: int = SLIDE_WIDTH,
    stride: int = SLIDE_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token windows: (id, win_idx, start_pos, n_tokens,
    digest).  Window i covers tokens [i*stride, i*stride + width); the
    last window may be shorter (it still carries the tail)."""
    toks = F.split(F.col(text_col), " ")
    # ceil(n / stride) windows; n >= 1 always (split('') = ['']), and the
    # sequence stop is clamped with greatest so it can never descend
    # (SURVEY §8: sequence(start, stop) DESCENDS when stop < start)
    n_win = F.greatest(F.ceil(F.size(toks) / F.lit(stride)).cast("int"), F.lit(1))
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, width)),
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(wins).alias("win_idx", "window"),
    ).select(
        F.col(id_col),
        "win_idx",
        (F.col("win_idx") * stride).alias("start_pos"),
        F.size(F.split(F.col("window"), " ")).alias("n_tokens"),
        F.md5(F.col("window")).alias("digest"),
    )


def q_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sliding_chunks(d)


SQL_SLIDING_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tt FROM documents
), wins AS (
  SELECT doc_id,
         unnest(range(0, greatest(CAST(ceil(len(tt) / {SLIDE_STRIDE}.0) AS INT), 1)))
           AS win_idx,
         unnest(list_transform(
           range(0, greatest(CAST(ceil(len(tt) / {SLIDE_STRIDE}.0) AS INT), 1)),
           i -> array_to_string(
                  list_slice(tt, i * {SLIDE_STRIDE} + 1,
                             i * {SLIDE_STRIDE} + {SLIDE_WIDTH}), ' ')))
           AS w
  FROM toks
)
SELECT doc_id,
       win_idx,
       win_idx * {SLIDE_STRIDE} AS start_pos,
       len(string_split(w, ' ')) AS n_tokens,
       md5(w) AS digest
FROM wins
"""

QUERIES["chunk_sliding_window"] = (q_sliding_chunks, SQL_SLIDING_CHUNKS)
