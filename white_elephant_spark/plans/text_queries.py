"""Training-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing — registered for the driver gate with
DuckDB oracles wherever SQL can express the semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from white_elephant_spark.functions import text as tx
from white_elephant_spark.operators import clustering, dedup, multimodal, similarity
from white_elephant_spark.plans.registry import register
from white_elephant_spark.sources.catalog import load_table

# --------------------------------------------------------------- dedup


def _docs_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies of every 3rd doc (id+1000000) — gives
    the dedup operators real duplicate mass to collapse."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.unionAll(copies)


_DOCS_COPIES_SQL = """
docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
)
"""


@register(
    "dedup_exact",
    oracle=f"""
WITH {_DOCS_COPIES_SQL.lstrip()}
SELECT md5(text) AS digest, MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM docs GROUP BY md5(text)
""",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-digest groupBy keeping the lowest id."""
    return dedup.exact_dedup(_docs_with_copies(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_DOCS_COPIES_SQL.lstrip()},
base AS (
  SELECT doc_id AS id, {dedup.sql_word_ngrams('text', 3)} AS grams
  FROM docs
),
sigs AS (
  {dedup.sql_minhash_signatures('text', 'doc_id', k=12, n=3).replace('FROM documents', 'FROM docs')}
),
bands AS (
  SELECT id, b AS band,
         md5(sig[b * 3 + 1] || '|' || sig[b * 3 + 2] || '|' || sig[b * 3 + 3]) AS bh
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
)
SELECT id_a, id_b,
       len(list_intersect(a.grams, b.grams))
         / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS jaccard
FROM cand JOIN base a ON a.id = cand.id_a JOIN base b ON b.id = cand.id_b
WHERE len(list_intersect(a.grams, b.grams))
        / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
""",
    tags=("dedup", "join", "lsh"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram exact-Jaccard pairs ≥ 0.5 over MinHash-band
    candidate blocks (the scale-safe default — hash-bounded bucket
    population instead of the token-frequency-skewed first-token
    block)."""
    return dedup.ngram_jaccard_pairs(_docs_with_copies(spark, sf_dir), n=3, threshold=0.5)


@register(
    "dedup_simhash_pairs",
    oracle=f"""
WITH {_DOCS_COPIES_SQL.lstrip()},
fp AS (
  {dedup.sql_simhash32('text', 'doc_id').replace('FROM documents', 'FROM docs').strip()}
),
{dedup.sql_simhash_neardup_pairs('fp', max_hamming=3, bands=4).strip()}
""",
    tags=("dedup", "join"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup *pairs*: 32-bit fingerprints → 4×8-bit radix
    blocking (complete for Hamming ≤ 3 by pigeonhole) → exact
    bit_count(XOR) filter. The other half of the SimHash story beyond
    ``dedup_simhash``'s fingerprints."""
    fps = dedup.simhash32(_docs_with_copies(spark, sf_dir))
    return dedup.simhash_neardup_pairs(fps, max_hamming=3, bands=4)


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_DOCS_COPIES_SQL.lstrip()},
fp AS (
  {dedup.sql_simhash32('text', 'doc_id').replace('FROM documents', 'FROM docs').strip()}
),
slices AS (
  SELECT id, simhash, b AS band, (simhash >> (b * 8)) & 255 AS bv
  FROM fp, (SELECT unnest(generate_series(0, 3)) AS b)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM slices a JOIN slices b ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
{clustering.sql_connected_components('pairs').strip()},
labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs d LEFT JOIN components c ON d.doc_id = c.node
),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM labeled GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
       l.doc_id = l.cluster_id AS is_representative
FROM labeled l JOIN sizes s USING (cluster_id)
""",
    tags=("dedup", "clustering"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assembly: SimHash near-dup pairs → iterative
    min-label connected components → every doc labeled with its
    transitive duplicate cluster, cluster population, and a
    deterministic representative flag. The step after pair-finding
    that an "A≈B, B≈C" corpus needs before it can drop B *and* C."""
    docs = _docs_with_copies(spark, sf_dir)
    fps = dedup.simhash32(docs)
    pairs = dedup.simhash_neardup_pairs(fps, max_hamming=3, bands=4)
    return clustering.attach_clusters(docs, pairs)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_DOCS_COPIES_SQL.lstrip()},
sigs AS (
  {dedup.sql_minhash_signatures('text', 'doc_id', k=12, n=3).replace('FROM documents', 'FROM docs')}
),
bands AS (
  SELECT id, sig, b AS band,
         md5(sig[b * 3 + 1] || '|' || sig[b * 3 + 2] || '|' || sig[b * 3 + 3]) AS bh
  FROM sigs, (SELECT unnest(generate_series(0, 3)) AS b)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       len(list_filter(generate_series(1, 12), i -> a.sig[i] = b.sig[i])) / 12.0 AS est_sim
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
""",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (k=12, trigram shingles) + 4-band LSH candidates."""
    sigs = dedup.minhash_signatures(_docs_with_copies(spark, sf_dir), k=12, n=3)
    return dedup.lsh_candidate_pairs(sigs, bands=4, rows=3, k=12)


@register(
    "dedup_simhash",
    oracle=dedup.sql_simhash32("text", "doc_id"),
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints over the documents table."""
    return dedup.simhash32(load_table(spark, sf_dir, "documents"))


# ----------------------------------------------------------- text analysis


@register(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       {tx.sql_token_count('text')} AS n_tokens,
       {tx.sql_distinct_ratio('text')} AS distinct_ratio,
       {tx.sql_stopword_ratio('text')} AS stopword_ratio,
       {tx.sql_mean_word_len('text')} AS mean_word_len,
       {tx.sql_quality_score('text')} AS quality
FROM documents
""",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + quality-score heuristics."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        tx.distinct_ratio(t).alias("distinct_ratio"),
        tx.stopword_ratio(t).alias("stopword_ratio"),
        tx.mean_word_len(t).alias("mean_word_len"),
        tx.quality_score(t).alias("quality"),
    )


@register(
    "token_stats",
    oracle=f"""
SELECT doc_id,
       {tx.sql_token_count('text')} AS ws_tokens,
       {tx.sql_bpe_token_count('text')} AS bpe_tokens,
       CAST(strlen(text) AS BIGINT) AS n_chars
FROM documents
""",
    tags=("text",),
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace split and a BPE-ish regex
    pre-tokenization (letter runs / digit runs / punctuation marks) —
    the per-document cost accounting a training-data pipeline needs."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(t).alias("ws_tokens"),
        tx.bpe_token_count(t).alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


@register(
    "lang_id",
    oracle=f"""
SELECT doc_id, lang AS labeled_lang, {tx.sql_predict_lang('text')} AS predicted_lang
FROM documents
""",
    tags=("text",),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.predict_lang(F.col("text")).alias("predicted_lang"),
    )


@register(
    "doc_fingerprints",
    oracle=f"""
SELECT doc_id, {tx.sql_fingerprint('text')} AS fingerprint FROM documents
""",
    tags=("text",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprints (md5 of sorted token set)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint(F.col("text")).alias("fingerprint"))


# ------------------------------------------------------------- similarity


@register(
    "ann_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 0
),
scored AS (
  SELECT query_id, e.vec_id AS nbr_id,
         {similarity.sql_cosine('qvec', 'e.embedding')} AS cos_sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
)
SELECT query_id, nbr_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
""",
    tags=("similarity", "topk"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for every 100th vector as query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.cosine_topk(emb, queries, k=10)


_ANN_PLANES, _ANN_TABLES = 3, 12


@register(
    "ann_lsh_topk",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding,
         {similarity.sql_encoded_buckets('embedding', 64, _ANN_PLANES, _ANN_TABLES)} AS buckets
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
         {similarity.sql_cosine('q.embedding', 'c.embedding')} AS cos_sim
  FROM b q JOIN b c
    ON len(list_intersect(q.buckets, c.buckets)) > 0 AND c.vec_id <> q.vec_id
  WHERE q.vec_id % 100 = 0
)
SELECT query_id, nbr_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
""",
    tags=("similarity", "topk", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: multi-table hyperplane LSH (12 tables × 3
    sign bits) — a neighbor is a candidate if
    it shares a bucket in ANY table, so one flipped sign bit can't
    lose it; cosine is ranked over the deduped candidate set. Holds
    recall@10 ≥ 0.9 vs the exact baseline on this corpus (asserted in
    tests). At 100 TB the (table, bucket) pair is the shuffle key and
    the candidate distinct runs on narrow id pairs only."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.lsh_cosine_topk(
        emb, queries, dim=64, k=10, planes=_ANN_PLANES, tables=_ANN_TABLES
    )


_IVF_STRIDE, _IVF_NPROBE = 50, 4


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % {_IVF_STRIDE} = 0
),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {similarity.sql_cosine('e.embedding', 'c.cvec')} DESC, c.cid ASC
         ) AS rn
  FROM embeddings e, cents c
),
cells AS (SELECT vec_id AS nbr_id, embedding AS nvec, cid FROM assign WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, embedding AS qvec, cid
  FROM assign WHERE rn <= {_IVF_NPROBE} AND vec_id % 100 = 0
),
scored AS (
  SELECT p.query_id, a.nbr_id, {similarity.sql_cosine('p.qvec', 'a.nvec')} AS cos_sim
  FROM probes p JOIN cells a ON a.cid = p.cid AND a.nbr_id <> p.query_id
)
SELECT query_id, nbr_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id ASC) AS rank
      FROM scored)
WHERE rank <= 10
""",
    tags=("similarity", "topk", "ivf"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: corpus partitioned into inverted lists by nearest
    sampled centroid (deterministic quantizer — every 50th vector),
    each query probes its 4 closest lists. Complements ``ann_lsh_topk``:
    IVF prunes by *cell locality* (strong on clustered corpora, the
    vector-search workhorse), LSH by sign-sketch collision. Cell
    assignment is a map-side Arrow-batched ranking against the
    broadcast centroid matrix — one scan, zero shuffle before the
    cid-keyed candidate join."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.ivf_cosine_topk(
        emb, queries, dim=64, k=10, stride=_IVF_STRIDE, nprobe=_IVF_NPROBE
    )


@register(
    "embedding_neardup",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, embedding, label FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.25 AS FLOAT)) AS embedding,
         label
  FROM embeddings WHERE vec_id % 50 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {similarity.sql_cosine('a.embedding', 'b.embedding')} AS cos_sim
FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {similarity.sql_cosine('a.embedding', 'b.embedding')} >= 0.999
""",
    tags=("similarity", "dedup"),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (label-blocked), over the
    corpus plus scaled copies of every 50th vector (scaling preserves
    cosine — guaranteed near-dups)."""
    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x.cast("double") * F.lit(1.25)).cast("float")
        ).alias("embedding"),
        "label",
    )
    vecs = emb.select("vec_id", "embedding", "label").unionAll(copies)
    return similarity.neardup_pairs(vecs, threshold=0.999, block_col="label")


# ------------------------------------------------------------- multimodal


@register(
    "multimodal_features",
    oracle="""
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS digest,
       CAST(1 + strlen(text) % 64 AS BIGINT) AS fake_width,
       CAST(1 + strlen(text) % 48 AS BIGINT) AS fake_height
FROM documents
""",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched
    mapInPandas (decode stubbed; plumbing real). The oracle recomputes
    the stub's deterministic outputs in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.documents_as_binary(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       substring(text, CAST(i * 256 + 1 AS INTEGER), 256) AS frame_str
FROM documents,
     unnest(generate_series(0, least(7, greatest(0, strlen(text) // 256 - 1)))) AS t(i)
""",
    tags=("multimodal", "pandas-udf", "explode"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped binary payloads: a 1→N
    mapInPandas explode, one row per sampled fixed-stride frame
    (ffmpeg keyframe-seek in a real deployment). The corpus is ASCII,
    so byte frames decode to the oracle's substring frames exactly."""
    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(multimodal.documents_as_binary(docs))
    return frames.select(
        "doc_id", "frame_idx", F.decode(F.col("frame"), "UTF-8").alias("frame_str")
    )
