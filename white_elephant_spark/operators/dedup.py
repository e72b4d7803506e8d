"""Deduplication operators for training-data pipelines.

Four families, each designed for the 100 TB regime:

- **exact**: hash-groupBy on content digest. One shuffle on a 32-byte
  key, combiner-friendly, no skew beyond true duplicate mass.
- **n-gram Jaccard**: shingle sets + blocked self-join. The pairwise
  compare only happens inside candidate blocks, never all-pairs.
- **MinHash + LSH**: k-permutation signatures → banded bucket join.
  Candidate generation is |bands|·|docs| rows shuffled by (band,
  hash) — linear, with per-bucket skew bounded by banding width.
- **SimHash**: per-token hashed bit votes → 64-bit integer
  fingerprint; near-dup = small Hamming distance, found by radix
  blocking (band-exact match by pigeonhole), never all-pairs.
- **cross-document repeated n-grams**: gram-digest document
  frequency — the measured form of exact-substring dedup.

Everything is md5-based (deterministic, available in both Spark and
DuckDB) so each operator has an exact SQL oracle. All expressions are
JVM-side Catalyst; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from white_elephant_spark.functions.text import tokens
from white_elephant_spark.session import persist_reuse

HEX = "0123456789abcdef"


# ------------------------------------------------------------------ exact


def content_digest(text: Column) -> Column:
    return F.md5(F.encode(text, "UTF-8"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-content group.
    groupBy on the digest (not the text) keeps shuffle rows narrow."""
    return (
        df.select(F.col(id_col), content_digest(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ----------------------------------------------------------- shingling


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Documents with fewer than n
    tokens yield an empty set — matching the SQL oracle twin, where
    DuckDB's generate_series over an inverted range is empty (Spark's
    ``sequence`` would instead invert with step -1 and ANSI
    ``element_at`` would throw on index 0)."""
    w = tokens(text)
    if n == 1:
        return F.array_distinct(w)
    idx = F.sequence(F.lit(1), F.size(w) - F.lit(n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        F.size(w) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def sql_word_ngrams(expr: str, n: int = 3) -> str:
    w = f"string_split({expr}, ' ')"
    if n == 1:
        return f"list_distinct({w})"
    parts = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, len({w}) - {n - 1}), i -> {parts}))"
    )


# ------------------------------------------------------- n-gram Jaccard


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block: Column | None = None,
    k: int = 12,
    bands: int = 4,
    rows: int = 3,
) -> DataFrame:
    """Jaccard-similar pairs over word n-gram sets. Output:
    (id_a, id_b, jaccard) with id_a < id_b.

    **Default blocking = MinHash LSH bands** (:func:`minhash_signatures`
    → :func:`lsh_candidate_pairs`): candidate pairs must share one of
    ``bands`` signature-band buckets, then the *exact* Jaccard is
    computed and thresholded. Bucket population is governed by the
    hash, not by token frequency — no "the"-block quadratic blow-up at
    corpus scale (the round-1 first-token default); recall at
    similarity s is 1-(1-s^rows)^bands (≥ 0.93 at s = 0.5 with the
    4×3 default, → 1 for exact dups).

    An explicit ``block`` column (e.g. a language or domain key)
    switches to the plain blocked self-join — useful when an exact
    within-block guarantee matters more than hash-bounded skew; tests
    keep the first-token form to pin the Jaccard math."""
    if block is not None:
        # The explicit-block path never touches `base` — building (and
        # persisting) it first would mark a dead plan cacheable.
        blocked = df.select(
            F.col(id_col).alias("id"),
            block.alias("blk"),
            word_ngrams(F.col(text_col), n).alias("grams"),
        ).persist()  # feeds both sides of the self-join below
        a, b = blocked.alias("a"), blocked.alias("b")
        return (
            a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                _jaccard(F.col("a.grams"), F.col("b.grams")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    base = df.select(
        F.col(id_col).alias("id"),
        word_ngrams(F.col(text_col), n).alias("grams"),
    )
    # base feeds both verify-side re-attach joins below; cache it so
    # the shingle construction runs once, not once per join side.
    base = persist_reuse(base)
    sigs = minhash_signatures(df, text_col, id_col, k=k, n=n)
    cand = lsh_candidate_pairs(sigs, bands=bands, rows=rows, k=k)
    return (
        cand.join(base.select(F.col("id").alias("id_a"), F.col("grams").alias("ga")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("grams").alias("gb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "est_sim",
            _jaccard(F.col("ga"), F.col("gb")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ----------------------------------------------------------- MinHash/LSH


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 12, n: int = 3
) -> DataFrame:
    """k-permutation MinHash signature per document: permutation i is
    the lexicographic min of md5(i:shingle) hex digests — a uniform
    hash family available identically in every engine."""
    # Explode shingles once, hash each k ways, take per-position mins
    # in one map-side-combinable aggregation. (The tempting
    # array-expression form — k × array_min(transform(grams, md5)) —
    # recomputes the shingling k times per row: Catalyst does not CSE
    # across array elements, and it benchmarked 30× slower.)
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    hashed = grams.select(
        "id",
        *[
            F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col("g")), "UTF-8")).alias(f"h{i}")
            for i in range(k)
        ],
    )
    agg = hashed.groupBy("id").agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(k)])
    return agg.select("id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))


def sql_minhash_signatures(expr: str, id_expr: str, k: int = 12, n: int = 3) -> str:
    grams = sql_word_ngrams(expr, n)
    sigs = ", ".join(
        f"list_min(list_transform({grams}, s -> md5('{i}:' || s)))" for i in range(k)
    )
    return f"SELECT {id_expr} AS id, [{sigs}] AS sig FROM documents"


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows: int = 3, k: int = 12
) -> DataFrame:
    """Banded LSH: hash each band of the signature; any shared
    (band, hash) bucket yields a candidate pair. Returns distinct
    (id_a, id_b, est_sim) where est_sim is the fraction of matching
    signature components."""
    assert bands * rows == k
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws("|", *[F.element_at(F.col("sig"), b * rows + r + 1) for r in range(rows)])
            )
            for b in range(bands)
        ]
    )
    exploded = sigs.select(
        "id", "sig", F.posexplode(band_hashes).alias("band", "bh")
    )
    # Materialize before the self-join: otherwise both join sides
    # recompute the full shingle→md5→min pipeline (the expensive
    # part). At warehouse scale this is a signatures *table*; here the
    # block cache plays that role.
    exploded = persist_reuse(exploded)
    a, b = exploded.alias("a"), exploded.alias("b")
    eq = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.element_at(F.col("a.sig"), i) == F.element_at(F.col("b.sig"), i),
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (eq / F.lit(float(k))).alias("est_sim"),
        )
        .distinct()
    )


# --------------------------------------------------------------- SimHash

_LONG_MIN = -(1 << 63)


def _bitval(bit: int) -> int:
    """Value of bit ``bit`` in a signed 64-bit fingerprint (bit 63 is
    the sign bit — the long MIN_VALUE, not 1<<63 which overflows)."""
    return _LONG_MIN if bit == 63 else 1 << bit


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint: each distinct token votes ±1 on 64
    bit positions taken from the nibbles of md5(token); the sign of
    each bit's tally forms the fingerprint. Near-duplicates have small
    Hamming distance.

    64 bits (not 32): at corpus scale the Hamming≤3 ball of a 32-bit
    fingerprint is dense enough that *random* collisions dominate the
    pair set (measured ×98 superlinear growth sf0.01→sf0.1); doubling
    the fingerprint width collapses the spurious mass while keeping
    genuinely similar documents within the threshold.

    Distributed shape: explode (token × bit) → two-level aggregate.
    Integer tallies make the result engine-exact.

    Implementation note: the ~260 column expressions are built as SQL
    strings (one ``selectExpr``/``F.expr`` py4j call per stage), not as
    per-Column Python objects — building this plan Column-by-Column
    costs ~1.3s of py4j round trips on the driver per invocation
    (measured), 3× the plan's entire executor time at sf0.1."""
    toks = df.selectExpr(
        f"`{id_col}` AS id",
        f"explode(array_distinct(split(`{text_col}`, ' '))) AS w",
    ).selectExpr("id", "md5(encode(w, 'UTF-8')) AS h")
    # Decode each hex nibble ONCE (16 string ops/row), then derive the
    # 64 bit votes with pure integer arithmetic — versus extracting
    # the nibble again for every bit (64 substring+instr per row, the
    # dominant map-stage cost at corpus scale). Values are identical,
    # so the DuckDB oracle twin is unaffected.
    nibbled = toks.selectExpr(
        "id",
        *[f"(instr('{HEX}', substring(h, {i + 1}, 1)) - 1) AS n{i}" for i in range(16)],
    )
    # 64 vote columns per (id, token) — wide-not-tall keeps the row
    # count at |tokens| (not 64×|tokens|) and needs a single shuffle.
    votes = nibbled.selectExpr(
        "id",
        *[f"(shiftright(n{bit // 4}, {bit % 4}) % 2 * 2 - 1) AS v{bit}" for bit in range(64)],
    )
    tally = votes.groupBy("id").agg(
        *[F.expr(f"sum(v{bit}) AS t{bit}") for bit in range(64)]
    )
    fp = " + ".join(
        f"(CASE WHEN t{bit} > 0 THEN {_bitval(bit)}L ELSE 0L END)" for bit in range(64)
    )
    return tally.selectExpr("id", f"CAST({fp} AS LONG) AS simhash")


def _block_combo_keys(fp_col: str, h: int):
    """Manku-Jain-Sarma block-combination blocking keys for 64-bit
    fingerprints at Hamming radius ``h`` (WWW'07 §3, the production
    scheme behind Google's 8B-page near-dup detection): split the
    fingerprint into B = 2h blocks; for every C(B, h) choice of
    B − h = h blocks, one table's key is the CONCATENATION of the
    chosen blocks (~32 bits). Any pair within Hamming distance h
    differs in at most h blocks, so at least h blocks are untouched
    and some choice of h blocks is entirely clean — that table keys
    them identically (complete by pigeonhole), while ~32-bit keys keep
    bucket occupancy ~N/2³² — vanishing until ~10¹⁰ distinct
    fingerprints. Returns the array of per-table keys (the table index
    is the array position, so the (band, key) join shape is unchanged
    from radix slicing)."""
    import itertools

    B = 2 * h
    widths = [64 // B + (1 if i < 64 % B else 0) for i in range(B)]
    offsets = [sum(widths[:i]) for i in range(B)]
    blocks = [
        F.shiftright(F.col(fp_col), offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1))
        for i in range(B)
    ]
    keys = []
    for combo in itertools.combinations(range(B), h):
        k = F.lit(0).cast("long")
        for i in combo:
            k = F.shiftleft(k, widths[i]).bitwiseOR(blocks[i])
        keys.append(k)
    return F.array(*keys)


#: ``scheme="auto"`` crossover: radix-4 explodes 4 rows/fp with
#: candidate volume ~4N²/2¹⁶; blocks explodes 20 rows/fp with
#: candidates ~20N²/2³². Radix is cheaper while 4N²/2¹⁶ < 16N, i.e.
#: N below ~2.6e5 distinct fingerprints — and its keyspace cliff sits
#: another decade up (~10⁶, the measured r11 wedge). 2e5 keeps an
#: order-of-magnitude margin from the cliff while reclaiming the 5×
#: exploded-row constant at gate scale (sf0.1: ~6e4 fps).
RADIX_AUTO_MAX = 200_000

#: Exploded band rows per shuffle partition for the candidate join:
#: ~1.5M ~28-byte rows ≈ 40 MB per task sorts in memory. The width
#: derived from this is a floor-raise only — it never shrinks the
#: session's configured parallelism.
_BAND_ROWS_PER_PART = 1_500_000


def simhash_neardup_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "id",
    fp_col: str = "simhash",
    scheme: str = "auto",
    distinct_fps: int | None = None,
) -> DataFrame:
    """Near-dup pairs from SimHash fingerprints via exact-key
    blocking + exact Hamming post-filter. Two complete blocking
    schemes, IDENTICAL output (every pair within ``max_hamming`` is a
    candidate in either, and the ``bit_count(a XOR b)`` filter keeps
    only true pairs — so the oracle twin and every test stay
    bit-equal regardless of scheme):

    - ``radix``: split into ``bands`` contiguous bit-slices; complete
      for ``max_hamming ≤ bands − 1`` by pigeonhole. Candidate volume
      grows as N²·bands/2^(64/bands): the old 8-band default (2⁸
      values/band) went quadratic at the r9 third-decade probe and
      was widened to 4×16 bits — but 16-bit keyspaces saturate too:
      at ~5M distinct fingerprints occupancy is ~70/bucket and the
      r11 FIFTH-decade probe measured the band join going quadratic
      again (the probe wedged for >80 min at sf100). Radix cannot go
      wider: h=3 already forces ≥4 bands.
    - ``blocks``: Manku-Jain-Sarma block combinations
      (:func:`_block_combo_keys`) — C(2h, h) tables keyed on ~32-bit
      block concatenations. 20 tables at h=3 (5× the exploded rows of
      radix-4, still linear) with occupancy ~N/2³²: the published
      scale answer for exactly this corpus size and the default for
      ``max_hamming ≤ 3`` via ``scheme="auto"``.

    ``bands`` applies to the radix scheme only.

    Output: (id_a, id_b, hamming), id_a < id_b. NOTE: over a corpus
    with heavy duplicate mass this materializes O(dup-mass²) rows —
    for cluster assembly use :func:`white_elephant_spark.operators.
    clustering.fingerprint_clusters`, which collapses identical
    fingerprints to one node *before* pairing (exactness-preserving,
    since equal fingerprints are Hamming-0 connected)."""
    if scheme == "auto":
        # Occupancy-aware pick: blocks is the 10¹⁰-linear scale
        # scheme, but it pays a 5× exploded-row constant that radix
        # needn't at corpus sizes far below radix's ~10⁶ keyspace
        # cliff. When the caller knows the distinct-fingerprint count
        # (fingerprint_clusters counts its collapsed groups anyway),
        # small corpora take radix; unknown counts default to blocks —
        # the safe-at-scale choice. Output is identical either way
        # (both schemes are complete + exact-filtered), so oracle
        # hashes never move across the switch point.
        # The small-corpus radix pick is gated on radix COMPLETENESS
        # (max_hamming <= bands - 1): a caller with bands=2,
        # max_hamming=3 must keep blocks (which is complete for
        # h <= 3 regardless of bands) rather than trip radix's
        # completeness guard below. Out-of-blocks-range h (> 3 or < 1)
        # still falls through to radix, whose guard raises a clear
        # error when bands can't cover it.
        small = distinct_fps is not None and distinct_fps <= RADIX_AUTO_MAX
        radix_complete = max_hamming <= bands - 1
        scheme = (
            "radix"
            if ((small and radix_complete) or not 1 <= max_hamming <= 3)
            else "blocks"
        )
    if scheme == "blocks":
        slices = _block_combo_keys(fp_col, max_hamming)
    elif scheme == "radix":
        if max_hamming > bands - 1:
            raise ValueError(
                f"radix blocking with {bands} bands is only complete up to "
                f"Hamming distance {bands - 1} (got max_hamming={max_hamming})"
            )
        width = 64 // bands
        mask = (1 << width) - 1
        slices = F.array(
            *[
                F.shiftright(F.col(fp_col), b * width).bitwiseAND(F.lit(mask))
                for b in range(bands)
            ]
        )
    else:
        raise ValueError(f"unknown scheme {scheme!r} (auto|blocks|radix)")
    e = fps.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("fp"),
        F.posexplode(slices).alias("band", "bv"),
    )
    # Shuffle-width scaling (r12 weak #1): the band self-join and the
    # final distinct ran at the session's fixed shuffle width (16 in
    # the probe harness) regardless of corpus size — at sf100 that
    # pushed ~76M exploded rows and ~46M verified-pair rows through
    # 16-partition exchanges, and per-task sort/aggregate spill is
    # what turns a linear candidate volume into superlinear wall
    # time. When the caller knows the distinct-fingerprint count
    # (fingerprint_clusters always does), width scales with the
    # exploded-row estimate at ~1.5M rows (~40 MB) per task; the
    # explicit repartition on the join keys is satisfied by BOTH
    # self-join sides (one exchange, reused) and the pair-key
    # repartition co-locates the distinct so it adds no second
    # exchange. Below the session width (every gate-scale corpus)
    # the plan is unchanged.
    import math

    n_tables = math.comb(2 * max_hamming, max_hamming) if scheme == "blocks" else bands
    sess = int(fps.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = (
        min(4096, max(sess, (distinct_fps * n_tables) // _BAND_ROWS_PER_PART))
        if distinct_fps is not None
        else sess
    )
    if parts > sess:
        # repartition + persist, not bare repartition: an explicit
        # REPARTITION_BY_NUM exchange defeats AQE's query-stage reuse
        # (measured: the self-join shuffled the exploded table TWICE),
        # while a cached repartition shuffles and explodes once and
        # both join sides scan the cache with its HashPartitioning
        # already satisfying the join distribution — zero further
        # exchanges. MEMORY_AND_DISK (the default) keeps the wide
        # path safe when the exploded table outgrows executor memory.
        e = persist_reuse(e.repartition(parts, "band", "bv"))
    a, b = e.alias("a"), e.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if parts > sess:
        # hash(id_a, id_b) co-locates every duplicate of a pair (they
        # arise in DIFFERENT band partitions, so map-side partial
        # dedup catches none of them) and satisfies the distinct's
        # clustering requirement — one wide exchange, no second one.
        out = out.repartition(parts, "id_a", "id_b")
    return out.distinct()


def sql_simhash_neardup_pairs(
    fp_cte: str, max_hamming: int = 3, bands: int = 4
) -> str:
    """DuckDB twin of :func:`simhash_neardup_pairs` over a CTE named
    ``fp_cte`` with columns (id, simhash). Kept on the radix scheme:
    both blocking schemes produce the identical verified pair set
    (completeness + the exact Hamming post-filter), so the twin needs
    no scheme knob and its hash — and the ratio tripwire's sha gate —
    stay stable across the Spark side's scheme choice."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
slices AS (
  SELECT id, simhash, b AS band, (simhash >> (b * {width})) & {mask} AS bv
  FROM {fp_cte}, (SELECT unnest(generate_series(0, {bands - 1})) AS b)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM slices a JOIN slices b ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# Bit 63 of a signed BIGINT can't be built with 1<<63 (overflow in
# DuckDB's checked shift) — emit the sign-bit constant directly.
_SQL_BITVAL = (
    "CASE WHEN bit = 63 THEN CAST(-9223372036854775808 AS BIGINT) "
    "ELSE (CAST(1 AS BIGINT) << bit) END"
)


def sql_simhash64(expr: str, id_expr: str) -> str:
    return f"""
SELECT id, CAST(SUM(CASE WHEN t > 0 THEN {_SQL_BITVAL} ELSE 0 END) AS BIGINT) AS simhash
FROM (
  SELECT id, bit, SUM(((strpos('{HEX}', substr(h, CAST(bit // 4 AS INTEGER) + 1, 1)) - 1 >> CAST(bit % 4 AS INTEGER)) % 2) * 2 - 1) AS t
  FROM (
    SELECT {id_expr} AS id, md5(w) AS h, bit
    FROM (SELECT {id_expr}, unnest(list_distinct(string_split({expr}, ' '))) AS w FROM documents),
         (SELECT unnest(generate_series(0, 63)) AS bit)
  )
  GROUP BY id, bit
)
GROUP BY id
"""


# ------------------------------------- cross-document repeated n-grams


def interdoc_repeated_ngrams(
    df: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_grams: DataFrame | None = None,
    gstats: DataFrame | None = None,
) -> DataFrame:
    """Per-document fraction of distinct word ``n``-grams that also
    appear in at least ``min_docs - 1`` OTHER documents — the
    cross-document twin of the within-document ``dup_ngram_ratio``
    and the aggregate-level cousin of exact-substring dedup (Lee et
    al.'s "Deduplicating Training Data Makes Language Models Better"
    removes exactly these shared spans; here they are *measured* so a
    curation pass can gate on the fraction).

    Output: (doc_id, n_grams, repeated_frac) — docs with fewer than
    ``n`` tokens have no grams and report 0 over 0 grams as 0.0.

    100 TB shape: one corpus scan explodes grams per doc as two
    xxhash64 lanes (16 bytes of longs shuffled per gram, never the
    text — and no md5 hex-string materialization: the digest never
    leaves the aggregation, so two *different-seed* 64-bit lanes —
    lane 2 salts FIRST so the fold changes the effective seed before
    the gram is hashed — give ~G²/2¹²⁹ expected colliding pairs under
    the usual independence model, zero to ~10¹⁸ grams, at a third of
    the md5-hex bytes; the r12 probe measured the md5-string form's
    shuffle spilling tens of GB at sf100); gram
    document-frequency is one combiner-friendly aggregation; the
    flag joins back on the digest. Gram-frequency skew ("the quick
    brown…" boilerplate in millions of docs) concentrates a key, but
    the payload per row is just the count — no pair materialization,
    so the hot key costs one reducer's worth of adds, not O(docs²)
    rows.

    ``pos_grams``/``gstats``: optional pre-built (persisted) frames
    from :func:`white_elephant_spark.operators.spans.positional_grams`
    / ``gram_stats`` at the same ``n``. Composed queries
    (corpus_curation) pass them so this measure rides the span
    rewrite's single corpus gram scan and single gram-wide aggregation
    instead of re-tokenizing and re-aggregating the whole corpus. The
    gram identity is hash-EQUAL between the builders (the same
    xxhash64 lanes over the same concatenated token window), and the
    per-doc DISTINCT this measure needs is recovered with one
    (id, g1, g2) dedup over the positional rows, so the output is
    identical either way.
    """
    if pos_grams is not None:
        grams = pos_grams.dropDuplicates(["id", "g1", "g2"]).select("id", "g1", "g2")
    else:
        grams = df.select(
            F.col(id_col).alias("id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
        ).select(
            "id",
            F.xxhash64(F.col("g")).alias("g1"),
            # Salt FIRST: multi-column xxhash64 folds sequentially with
            # the running hash as the next column's seed, so
            # xxhash64(g, lit(1)) would be a deterministic function of
            # xxhash64(g) — any g1 collision implies a g2 collision and
            # the pair is worth only one 64-bit lane. xxhash64(lit(1),
            # g) changes the *effective seed* before g is hashed,
            # making the lanes behave as two different-seed 64-bit
            # hashes.
            F.xxhash64(F.lit(1), F.col("g")).alias("g2"),
        )
        # grams feeds BOTH the document-frequency aggregate and the
        # flag-join back; without the cache the tokenize→shingle→hash
        # corpus scan — the dominant cost at scale — runs twice.
        grams = persist_reuse(grams)
    gdf = (
        gstats.select("g1", "g2", "gdf")
        if gstats is not None
        else grams.groupBy("g1", "g2").agg(F.count_distinct("id").alias("gdf"))
    )
    flagged = grams.join(gdf, ["g1", "g2"]).select(
        "id", (F.col("gdf") >= min_docs).cast("int").alias("rep")
    )
    per_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        (F.sum("rep").cast("double") / F.count(F.lit(1))).alias("repeated_frac"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("repeated_frac"), F.lit(0.0)).alias("repeated_frac"),
        )
    )


def sql_interdoc_repeated_ngrams(docs_cte: str, n: int = 8, min_docs: int = 2) -> str:
    """DuckDB twin: CTE chain ending in ``interdoc`` (doc_id, n_grams,
    repeated_frac) over a CTE with (doc_id, text)."""
    grams = sql_word_ngrams("text", n)
    return f"""
ig AS (
  SELECT doc_id AS id, md5(g) AS g
  FROM (SELECT doc_id, unnest({grams}) AS g FROM {docs_cte})
),
igdf AS (SELECT g, COUNT(DISTINCT id) AS gdf FROM ig GROUP BY g),
iflag AS (
  SELECT id, CASE WHEN gdf >= {min_docs} THEN 1 ELSE 0 END AS rep
  FROM ig JOIN igdf USING (g)
),
iper AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(rep) AS DOUBLE) / COUNT(*) AS repeated_frac
  FROM iflag GROUP BY id
),
interdoc AS (
  SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
         COALESCE(p.repeated_frac, 0.0) AS repeated_frac
  FROM {docs_cte} d LEFT JOIN iper p ON d.doc_id = p.id
)
"""


# ------------------------------------------------------- incremental


def exact_state(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The at-rest exact-dedup state: the corpus's distinct content
    digests. At 100 TB this is a maintained warehouse table (append
    new digests per admitted batch), ~32 bytes per distinct document
    — the batch analogue of the streaming seen-set
    (streaming/dedup_stream.py), without its watermark horizon."""
    return corpus.select(content_digest(F.col(text_col)).alias("digest")).distinct()


def incremental_exact(
    batch: DataFrame,
    state: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Admit only batch documents whose content digest is absent from
    the corpus state — one LEFT ANTI equi-join on the 32-byte digest
    (hash-partitioned on digest; no corpus text ever moves). The
    incremental complement to :func:`exact_dedup`: a nightly crawl
    lands, joins against the digest table, and only novel content
    proceeds to the expensive near-dup passes."""
    tagged = batch.withColumn("__dg", content_digest(F.col(text_col)))
    st = state.select(F.col("digest").alias("__dg"))
    return tagged.join(st, "__dg", "left_anti").drop("__dg")


def incremental_minhash(
    batch: DataFrame,
    corpus_sigs: DataFrame,
    threshold: float = 0.7,
    bands: int = 4,
    rows: int = 3,
    k: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate matches of a NEW batch against an EXISTING
    corpus signature table: (id_new, id_corpus, est_sim) for every
    batch document whose MinHash similarity estimate reaches
    ``threshold`` against some corpus document. Pass ``batch_sigs``
    (id, sig) when the batch's signatures already exist — e.g. one
    signature table computed for the whole corpus and split by id —
    to skip recomputing the shingle→md5→min pipeline.

    The scale contract differs from :func:`lsh_candidate_pairs` (the
    at-rest self-join): the corpus side is a *precomputed state
    table* (``minhash_signatures`` output, maintained like the digest
    table), so per-batch cost is O(|batch|·bands) bucket probes
    against it — corpus-vs-corpus pairs are never generated, and the
    join is a plain (band, hash) equi-join that broadcasts whenever
    the batch's exploded band table is small."""
    assert bands * rows == k

    def banded(sigs: DataFrame, side: str) -> DataFrame:
        bh = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.element_at(F.col("sig"), b * rows + r + 1) for r in range(rows)],
                    )
                )
                for b in range(bands)
            ]
        )
        return sigs.select(
            F.col("id").alias(f"id_{side}"),
            F.col("sig").alias(f"sig_{side}"),
            F.posexplode(bh).alias("band", "bh"),
        )

    new_sigs = (
        batch_sigs
        if batch_sigs is not None
        else minhash_signatures(batch, text_col=text_col, id_col=id_col, k=k, n=n)
    )
    a = banded(new_sigs, "new")
    b = banded(corpus_sigs, "corpus")
    eq = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.element_at(F.col("sig_new"), i)
            == F.element_at(F.col("sig_corpus"), i),
        )
    )
    return (
        a.join(b, ["band", "bh"])
        .select("id_new", "id_corpus", (eq / F.lit(float(k))).alias("est_sim"))
        .distinct()
        .filter(F.col("est_sim") >= threshold)
    )


# ------------------------------------------------------ LSH tuning


def lsh_match_probability(sim: float, bands: int, rows: int) -> float:
    """P(candidate) for a pair at Jaccard ``sim`` under banded
    MinHash LSH: ``1 - (1 - sim^rows)^bands`` (Mining of Massive
    Datasets §3.4.2 — each band matches iff all its rows agree)."""
    return 1.0 - (1.0 - sim**rows) ** bands


def tune_lsh(threshold: float, k: int = 12) -> tuple[int, int]:
    """Pick (bands, rows) with bands·rows = k whose S-curve is
    steepest around ``threshold``: the candidate classifier should
    fire for pairs above the target Jaccard and stay quiet below it.

    Selection rule: maximize P(candidate at threshold+0.1) −
    P(candidate at threshold−0.1) — the discrimination margin of the
    S-curve across the decision boundary (the curve's inflection sits
    near (1/bands)^(1/rows); this picks the divisor pair that puts it
    closest to the threshold while preferring steeper curves). Ties
    break toward more rows (fewer false candidates — verification
    cost dominates at 100 TB, so quiet beats eager)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    pairs = [(k // r, r) for r in range(1, k + 1) if k % r == 0]
    lo, hi = max(threshold - 0.1, 0.0), min(threshold + 0.1, 1.0)

    def margin(br):
        b, r = br
        return (
            lsh_match_probability(hi, b, r) - lsh_match_probability(lo, b, r),
            br[1],  # tie-break: more rows
        )

    return max(pairs, key=margin)
