"""Corpus-curation queries: deterministic sampling, leakage-safe
splitting, PII scrubbing, term relevance, sequence packing, and the
composed keep/drop curation pass — the decision layer of a
training-data pipeline, downstream of the dedup/quality operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from white_elephant_spark.functions import text as tx
from white_elephant_spark.operators import clustering, dedup, packing, relevance, sampling
from white_elephant_spark.plans.registry import register
from white_elephant_spark.plans.text_queries import _DOCS_COPIES_SQL, _docs_with_copies
from white_elephant_spark.sources.catalog import load_table

_SAMPLE_RATES = {"en": 60, "zh": 20}


@register(
    "stratified_doc_sample",
    oracle=f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {sampling.sql_stratified_sample_pred('lang', _SAMPLE_RATES, 10, 'doc_id')}
""",
    tags=("sampling",),
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket stratified sample: 60% of English, 20% of Chinese,
    10% of everything else — reproducible on any partitioning (content
    hash, not RNG), applied as a map-side filter that pushes through
    the scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.stratified_sample(
        docs, "lang", _SAMPLE_RATES, default_rate=10, id_col="doc_id"
    )


@register(
    "leakage_safe_split",
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
)
SELECT doc_id, cluster_id,
       {sampling.sql_split_expr('cluster_id', 90)} AS split
FROM labeled
""",
    tags=("sampling", "dedup", "clustering"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split hashed on the duplicate-cluster id, not the
    document id: near-duplicates (SimHash pairs → connected
    components) land in the same split by construction, closing the
    train→test contamination path."""
    docs = _docs_with_copies(spark, sf_dir)
    fps = dedup.simhash32(docs)
    pairs = dedup.simhash_neardup_pairs(fps, max_hamming=3, bands=4)
    labeled = clustering.attach_clusters(docs, pairs).select("doc_id", "cluster_id")
    return sampling.split_by_cluster(labeled, train_pct=90)


_PII_AUG = (
    "CASE WHEN doc_id % 5 = 0 THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com via http://ex.com/' || CAST(doc_id AS VARCHAR) ELSE text END"
)


@register(
    "pii_scrub",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_PII_AUG} AS text FROM documents)
SELECT doc_id,
       {tx.sql_pii_counts('text')[0]} AS n_emails,
       {tx.sql_pii_counts('text')[1]} AS n_urls,
       {tx.sql_normalize_text(tx.sql_scrub_pii('text'))} AS clean
FROM aug
""",
    tags=("text", "scrub"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pass: count and redact emails/URLs (typed placeholders),
    then normalize whitespace/case. Fixture PII is injected
    deterministically into every 5th document (the corpus itself is
    synthetic-clean). Pure codegen expressions — no Python in the
    row path."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via http://ex.com/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    n_emails, n_urls = tx.pii_counts(F.col("text"))
    return aug.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        tx.normalize_text(tx.scrub_pii(F.col("text"))).alias("clean"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
WITH base AS (SELECT doc_id, text FROM documents),
{relevance.sql_tfidf_top_terms('base', k=3).strip()}
""",
    tags=("text", "relevance", "topk"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document: one narrow
    (doc, term) shuffle builds the term index; document frequency
    aggregates from the index; the corpus-size scalar attaches by
    broadcast cross join. Rational idf (N+1)/(df+1) — monotone in df,
    log-free so both engines agree bitwise."""
    docs = load_table(spark, sf_dir, "documents")
    return relevance.tfidf_top_terms(docs, k=3)


_BM25_TERMS = ["join", "vector", "data"]


@register(
    "bm25_documents",
    oracle=f"""
WITH docs_cte AS (SELECT doc_id, text FROM documents),
{relevance.sql_bm25_scores('docs_cte', _BM25_TERMS).strip()}
""",
    tags=("text", "relevance"),
)
def bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, log-free rank-equivalent idf) of every
    document against a fixed bag-of-terms query; per-doc term scores
    summed through DECIMAL so engine summation order can't drift the
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    return relevance.bm25_scores(docs, _BM25_TERMS)


@register(
    "pack_sequences",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {tx.sql_token_count('text')} AS ntok FROM documents
)
{packing.sql_pack_linear('base', 'ntok', budget=512, shards=8).strip()}
""",
    tags=("packing", "window"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded linear sequence packing: 8 hash shards pack
    independently (the parallel unit at corpus scale), documents fill
    512-token training bins in deterministic id order via one
    cumulative-sum window. Integer math end-to-end."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count(F.col("text")).alias("ntok")
    )
    return packing.pack_linear(docs, token_col="ntok", budget=512, shards=8)


@register(
    "corpus_curation",
    oracle=f"""
WITH {_DOCS_COPIES_SQL.lstrip()},
scored AS (
  SELECT doc_id,
         {tx.sql_predict_lang('text')} AS lang_pred,
         {tx.sql_quality_score('text')} AS quality,
         MIN(doc_id) OVER (PARTITION BY md5(text)) = doc_id AS is_canonical
  FROM docs
)
SELECT doc_id, lang_pred, quality, is_canonical,
       is_canonical AND lang_pred = 'en' AND quality >= 0.5 AS keep
FROM scored
""",
    tags=("text", "curation", "dedup"),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation decision: exact-dup canonical flag
    (min-id per content digest), language-ID, quality score, and the
    final keep verdict (canonical ∧ English ∧ quality ≥ 0.5) — one
    pass, one window, all codegen expressions."""
    docs = _docs_with_copies(spark, sf_dir)
    w = Window.partitionBy(F.md5(F.col("text")))
    scored = docs.select(
        "doc_id",
        tx.predict_lang(F.col("text")).alias("lang_pred"),
        tx.quality_score(F.col("text")).alias("quality"),
        (F.min("doc_id").over(w) == F.col("doc_id")).alias("is_canonical"),
    )
    return scored.select(
        "doc_id",
        "lang_pred",
        "quality",
        "is_canonical",
        (
            F.col("is_canonical")
            & (F.col("lang_pred") == "en")
            & (F.col("quality") >= 0.5)
        ).alias("keep"),
    )
