"""Amplified-corpus realism validation — the anti-artifact tripwire.

Three confirmed scale-probe "cliffs" beyond the one real keyspace
saturation turned out to be SYNTHESIS artifacts of the amplifier, each
costing a full diagnosis round: (1) per-token suffix grams kept
cross-copy shingles shared (Ed-Join candidates 45x instead of 10x),
(2) per-(copy, dim) diagonal jitter left same-origin cosines ~0.993
(planted C(copies,2) semantic-dup mass), (3) the auto key unit pushed
real doc_ids into the query-side planted-id band at 300 copies
(corpus_curation output doubled). A hypothesized fourth — "the
alnum-only cipher left punctuation-only tokens invariant, planting a
cross-copy simhash mega-cluster" (r11) — was REFUTED by round-12
measurement (see SCALING.md's retraction: the corpus contains zero
punctuation, the regenerated corpus reproduces the r11 numbers
exactly, and this module itself measures ``cross_copy_edges: 0``; the
big clusters are single copies' legitimate intra-copy near-dup
blobs). The token-invariance check below REMAINS as a genuine guard
for future corpora that DO contain an un-ciphered character class.
#3 is guarded at generation time by ``_band_safe``; this module folds
the diagnostics that caught #1/#2 (and would catch a real #4-class
artifact) into post-generation validation so the NEXT artifact class
fails the generator loudly instead of wedging a probe round.

Three checks over a generated corpus (source dir + out dir + copies):

- **token invariance** (the hypothesized-#4 class, generalized): for a sampled
  set of origin docs, no copy's token set may overlap another copy's
  by >= ``overlap_threshold`` — a cipher that leaves ANY character
  class un-mapped shows up as docs whose tokens survive verbatim in
  every copy. Accidental single-token coincidences (rotation of one
  word landing on another real word) stay far below the threshold.
- **cross-copy edge mass** (the simhash-side signature an
  invariant-class artifact WOULD leave): near-dup edges between
  distinct fingerprints in DIFFERENT copies must stay within a
  modeled band of ``copies x base_edges`` — real content-disjoint
  growth plants ~zero cross-copy edges (measured 0 at sf10/sf100
  r12), while an invariant token class would plant C(copies,
  2)-shaped mass. Total edges are also bounded at 3x copies x
  base_edges as a gross-superlinearity guard.
- **cross-copy cosine** (artifact class #2): sampled same-origin
  embedding pairs across copies must have |cosine| below a bound that
  random orthogonal rotations satisfy with huge margin (~N(0, 1/dim))
  but the jitter artifact (0.993) violates outright.

Importable (``validate_amplified``) for the generator and tests, and
a CLI for standalone re-validation of an existing corpus:

    python tools/corpus_check.py OUT_DIR [SRC_DIR]

(reads copies/units from OUT_DIR/_CORPUS_MANIFEST.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


class CorpusArtifactError(Exception):
    """A generated corpus carries a synthesis artifact that would
    corrupt scale measurements built on it."""


#: a doc-PAIR overlap this high across two copies means a whole token
#: class passed through the cipher un-mapped (the artifact sits at
#: ~1.0: every token of the class invariant, only the mapped-class
#: tokens differing). Genuine cipher coincidences — rotation or
#: permutation images landing on tokens the sister copy also has —
#: are unavoidable for low-entropy tokens over a 26/10/32-char class
#: alphabet and rise with copy count, but they hit individual tokens,
#: not whole docs: near-total overlap is the unciphered-class
#: signature, and anything below it that still plants simhash mass is
#: the edge_mass check's job (which measures the effect directly).
OVERLAP_THRESHOLD = 0.9
#: ignore docs with fewer distinct tokens than this (a 1-2 token doc
#: can hit the threshold through a single coincidence).
MIN_TOKENS = 3
#: cross-copy edges allowed, as a fraction of copies x base_edges
#: (plus an absolute floor for tiny test corpora). The punctuation
#: artifact measured ~16x this bound at sf10.
CROSS_EDGE_FRACTION = 0.10
CROSS_EDGE_FLOOR = 50
#: total-edge gross-superlinearity guard. Per-copy simhash edge counts
#: re-randomize under the cipher and the distribution near the
#: Hamming-3 threshold is WIDE — measured at sf10 (100 copies of the
#: r12 corpus): per-copy counts 1.7k..46k, mean 13.9k, with the
#: un-ciphered copy 0 drawing 8.7k — so ``base_edges`` (copy 0's
#: draw) estimates the per-copy mean only within a few-x band. The
#: factor absorbs that; if a future base draw lands in the LOW tail
#: and this fires with cross/same_origin both zero, it's a
#: false positive of the noisy anchor — re-anchor to the per-copy
#: median in the report rather than loosening the cross checks.
TOTAL_EDGE_FACTOR = 3.0
#: random orthogonal rotations put same-origin cross-copy cosines at
#: ~N(0, 1/dim) (sigma ~0.125 at dim=64); the jitter artifact sat at
#: ~0.993. 0.8 separates them by many sigmas from both sides.
COSINE_BOUND = 0.8


def _sampled_origins(df: DataFrame, id_col: str, unit: int, sample: int) -> DataFrame:
    """Deterministic origin sample: crc32-threshold on the origin id
    (no driver collect, no RNG — reruns pick the identical set)."""
    origins = df.select((F.col(id_col) % unit).alias("origin")).distinct()
    n = origins.count()
    if n <= sample:
        return origins
    # keep ~`sample` origins: crc32 is uniform enough on integer text
    keep_mod = max(1, n // sample)
    return origins.where(
        F.pmod(F.crc32(F.col("origin").cast("string")), F.lit(keep_mod)) == 0
    )


def token_invariance_report(
    amp_docs: DataFrame,
    doc_unit: int,
    sample: int = 400,
    overlap_threshold: float = OVERLAP_THRESHOLD,
    min_tokens: int = MIN_TOKENS,
) -> dict:
    """Fraction of each sampled doc-copy's distinct tokens that appear
    verbatim in another copy of the same origin doc. A correct
    per-copy bijective cipher leaves only rare coincidences (one
    token's image happening to equal another copy's token); an
    un-mapped character class leaves whole token classes invariant and
    pushes the fraction to ~1.0 for the affected docs."""
    docs = amp_docs.select(
        (F.col("doc_id") % doc_unit).alias("origin"),
        (F.col("doc_id") / doc_unit).cast("long").alias("copy"),
        "text",
    )
    keep = _sampled_origins(amp_docs, "doc_id", doc_unit, sample)
    docs = docs.join(F.broadcast(keep), "origin")
    toks = docs.select(
        "origin",
        "copy",
        F.explode(F.array_distinct(F.split(F.col("text"), r"\s+"))).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = toks.groupBy("origin", "copy").agg(F.count("*").alias("n_toks"))
    # pairwise: tokens two SPECIFIC copies of the same origin share
    # verbatim (a (origin, tok) equi-join — on a healthy corpus each
    # token matches a handful of coincidental copies; an unciphered
    # class makes every copy pair match and the join mass itself is
    # C(copies, 2)-shaped, which is fine: the validator's job is to
    # fail that corpus, cheaply on the sampled origins)
    a, b = toks.alias("a"), toks.alias("b")
    shared_pair = (
        a.join(b, ["origin", "tok"])
        .where(F.col("a.copy") < F.col("b.copy"))
        .groupBy("origin", F.col("a.copy").alias("c1"), F.col("b.copy").alias("c2"))
        .agg(F.count("*").alias("n_shared"))
    )
    n1 = per_doc.select("origin", F.col("copy").alias("c1"), F.col("n_toks").alias("t1"))
    n2 = per_doc.select("origin", F.col("copy").alias("c2"), F.col("n_toks").alias("t2"))
    frac = (
        shared_pair.join(n1, ["origin", "c1"])
        .join(n2, ["origin", "c2"])
        .where(F.least("t1", "t2") >= min_tokens)
        .select(
            "origin",
            "c1",
            "c2",
            (F.col("n_shared") / F.least("t1", "t2")).alias("frac"),
        )
    )
    bad = frac.where(F.col("frac") >= overlap_threshold)
    n_bad = bad.count()
    worst = bad.orderBy(F.desc("frac")).limit(5).collect() if n_bad else []
    mx = frac.agg(F.max("frac")).collect()[0][0]
    return {
        "check": "token_invariance",
        "sampled_docs": per_doc.count(),
        "max_shared_fraction": round(float(mx or 0.0), 4),
        "suspicious_doc_pairs": n_bad,
        "worst": [
            {
                "origin": r["origin"],
                "copies": [r["c1"], r["c2"]],
                "frac": round(r["frac"], 4),
            }
            for r in worst
        ],
        "ok": n_bad == 0,
    }


#: same-origin cross-copy fingerprints this close mean the cipher
#: left the doc near-invariant: a healthy per-copy bijection makes
#: sister fingerprints INDEPENDENT 64-bit values (expected Hamming 32,
#: P(<=8) ~ 1e-11 — a single hit in a 10^5-pair sample is meaningful).
SAME_ORIGIN_HAMMING = 8


def edge_mass_report(
    base_docs: DataFrame,
    amp_docs: DataFrame,
    doc_unit: int,
    copies: int,
    cross_fraction: float = CROSS_EDGE_FRACTION,
    total_factor: float = TOTAL_EDGE_FACTOR,
    cross_floor: int = CROSS_EDGE_FLOOR,
    sample: int = 400,
) -> dict:
    """Three simhash-side artifact signatures over the amplified
    corpus:

    - **same_origin_neardup** (primary): sampled same-origin
      consecutive-copy fingerprint pairs within Hamming
      ``SAME_ORIGIN_HAMMING``. A healthy cipher re-randomizes every
      token hash, so sister fingerprints are independent; ANY count
      above zero means some content class passed through un-mapped.
      Consecutive pairs suffice — an unciphered class hits every
      pair. This signal survives the regime where sister copies
      collapse to IDENTICAL fingerprints (there distinct-fp edge
      counts stay flat while cluster membership explodes, so the two
      edge checks below would both miss it).
    - **cross_copy_edges**: near-dup edges between distinct-fp
      representatives in different copies (id-stride attribution;
      representatives are min-id, so attribution degrades when fp
      values recur across copies — the same-origin check covers that
      corner). Budget: ``cross_fraction x copies x base_edges`` with
      an absolute floor (the r11 punct artifact measured ~16x this
      band at sf10: 1.39M cross edges vs base 8.7k x 10).
    - **amplified_edges** vs ``total_factor x copies x base_edges``:
      gross-superlinearity guard (per-copy edge counts re-randomize
      under the cipher, hence the generous factor)."""
    from white_elephant_spark.operators import dedup

    def _edges(docs: DataFrame) -> DataFrame:
        fps = dedup.simhash64(docs)
        groups = (
            fps.groupBy("simhash").agg(F.min("id").alias("id")).select("id", "simhash")
        )
        return dedup.simhash_neardup_pairs(groups)

    base_edges = _edges(base_docs).count()
    amp = _edges(amp_docs).select(
        (F.col("id_a") / doc_unit).cast("long").alias("ca"),
        (F.col("id_b") / doc_unit).cast("long").alias("cb"),
    )
    counts = amp.agg(
        F.count("*").alias("total"),
        F.sum((F.col("ca") != F.col("cb")).cast("long")).alias("cross"),
    ).collect()[0]
    total, cross = int(counts["total"]), int(counts["cross"] or 0)
    # per-copy distribution context (intra edges attributed to id_a's
    # copy): exposes the rehash variance so a total-budget trip can be
    # read against the actual spread instead of copy 0's single draw
    percopy = (
        amp.where(F.col("ca") == F.col("cb"))
        .groupBy("ca")
        .count()
        .agg(
            F.min("count").alias("mn"),
            F.expr("percentile_approx(count, 0.5)").alias("md"),
            F.max("count").alias("mx"),
        )
        .collect()[0]
    )

    # same-origin consecutive-copy proximity, sampled origins
    keep = _sampled_origins(amp_docs, "doc_id", doc_unit, sample)
    fps = dedup.simhash64(amp_docs).select(
        (F.col("id") % doc_unit).alias("origin"),
        (F.col("id") / doc_unit).cast("long").alias("copy"),
        "simhash",
    ).join(F.broadcast(keep), "origin")
    a = fps.alias("a")
    b = fps.select(
        "origin", (F.col("copy") - 1).alias("copy"), F.col("simhash").alias("sh_next")
    ).alias("b")
    same_origin = (
        a.join(b, ["origin", "copy"])
        .where(
            F.expr(f"bit_count(simhash ^ sh_next) <= {SAME_ORIGIN_HAMMING}")
        )
        .count()
    )

    cross_budget = max(cross_floor, int(cross_fraction * copies * base_edges))
    total_budget = int(total_factor * copies * base_edges) + 100
    return {
        "check": "edge_mass",
        "base_edges": base_edges,
        "amplified_edges": total,
        "cross_copy_edges": cross,
        "same_origin_neardup": same_origin,
        "per_copy_edges": {
            "min": int(percopy["mn"] or 0),
            "median": int(percopy["md"] or 0),
            "max": int(percopy["mx"] or 0),
        },
        "cross_budget": cross_budget,
        "total_budget": total_budget,
        "ok": same_origin == 0 and cross <= cross_budget and total <= total_budget,
    }


def cosine_report(
    amp_emb: DataFrame,
    vec_unit: int,
    sample: int = 400,
    bound: float = COSINE_BOUND,
) -> dict:
    """Max |cosine| between copy-0 and copy-c embeddings of the same
    origin vector, over a sampled origin set. Orthogonal per-copy
    rotations keep this at noise level; the diagonal-jitter artifact
    class sits near 1."""
    emb = amp_emb.select(
        (F.col("vec_id") % vec_unit).alias("origin"),
        (F.col("vec_id") / vec_unit).cast("long").alias("copy"),
        "embedding",
    )
    keep = _sampled_origins(amp_emb, "vec_id", vec_unit, sample)
    emb = emb.join(F.broadcast(keep), "origin")
    base = emb.where(F.col("copy") == 0).select(
        "origin", F.col("embedding").alias("e0")
    )
    rest = emb.where(F.col("copy") > 0).select("origin", "copy", "embedding")
    dot = F.aggregate(
        F.zip_with("e0", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = rest.join(base, "origin").select(
        "origin",
        "copy",
        (dot / (norm("e0") * norm("embedding"))).alias("cos"),
    ).where(norm("e0") * norm("embedding") > 0)
    mx = cos.agg(F.max(F.abs(F.col("cos")))).collect()[0][0]
    mx = float(mx) if mx is not None else 0.0
    return {
        "check": "cross_copy_cosine",
        "sampled_pairs": cos.count(),
        "max_abs_cosine": round(mx, 4),
        "bound": bound,
        "ok": mx < bound,
    }


def validate_amplified(
    spark,
    out_dir: str,
    src_dir: str,
    copies: int,
    doc_unit: int | None = None,
    vec_unit: int | None = None,
    sample: int = 400,
    tables: set[str] | None = None,
) -> list[dict]:
    """Run every applicable check; raise :class:`CorpusArtifactError`
    listing all failures. ``tables`` limits checks to generated tables
    (a ``--tables`` partial corpus skips what it didn't write)."""
    if copies <= 1:
        return []  # a 1-copy corpus has no cross-copy structure to check

    def _has(t: str) -> bool:
        return (tables is None or t in tables) and os.path.exists(
            os.path.join(out_dir, f"{t}.parquet")
        )

    reports: list[dict] = []
    if _has("documents") and doc_unit:
        amp_docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
        base_docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
        reports.append(token_invariance_report(amp_docs, doc_unit, sample=sample))
        reports.append(edge_mass_report(base_docs, amp_docs, doc_unit, copies))
    if _has("embeddings") and vec_unit:
        amp_emb = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet"))
        reports.append(cosine_report(amp_emb, vec_unit, sample=sample))
    bad = [r for r in reports if not r["ok"]]
    if bad:
        raise CorpusArtifactError(
            "amplified corpus carries synthesis artifacts:\n"
            + "\n".join(json.dumps(r) for r in bad)
        )
    return reports


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0]
    with open(os.path.join(out_dir, "_CORPUS_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    src = args[1] if len(args) > 1 else manifest["src"]
    copies = int(manifest["copies"])
    tables = set(manifest["tables"]) if "tables" in manifest else None
    doc_unit, vec_unit = manifest.get("doc_unit"), manifest.get("vec_unit")
    if doc_unit is None or vec_unit is None:
        sys.exit(
            "manifest predates unit stamping (pre-r12 tool) — regenerate"
            " the corpus with tools/make_scale_corpus.py at HEAD."
        )

    from white_elephant_spark.session import get_spark

    spark = get_spark(
        "corpus-check",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "32")),
    )
    try:
        reports = validate_amplified(
            spark, out_dir, src, copies, doc_unit, vec_unit, tables=tables
        )
    except CorpusArtifactError as e:
        print(f"FAIL {out_dir}: {e}", flush=True)
        raise SystemExit(1)
    for r in reports:
        print(json.dumps(r), flush=True)
    print(f"OK {out_dir}: {len(reports)} checks green", flush=True)


if __name__ == "__main__":
    main()
