"""Amplifier-realism tripwire (tools/corpus_check.py): the validator
must FAIL loudly on a corpus carrying a planted artifact class (an
un-ciphered character class — the bug family r11 HYPOTHESIZED for
punctuation; the specific r11 diagnosis was refuted by round-12
measurement, see SCALING.md's retraction, but the class is real and
these tests plant it deliberately via digits) and PASS on the same
source amplified with the fixed cipher.

Three confirmed probe cliffs beyond the one real keyspace saturation
were synthesis artifacts, each costing a diagnosis round — this pins
the generator's post-generation validation red AND green so the next
artifact class dies at generation time, not at probe time.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tools.corpus_check import (
    COSINE_BOUND,
    CorpusArtifactError,
    cosine_report,
    edge_mass_report,
    token_invariance_report,
    validate_amplified,
)
from tools.make_scale_corpus import _ALPHA, _DIGIT, _emb_rotation, cipher_maps, doc_copy

UNIT = 10_000  # id stride between copies
COPIES = 3


N_CARRIER = 30  # artifact-carrier docs (one near-dup class)


def _base_docs(spark):
    """~40 word docs + 12 digit-dominated docs (the artifact carrier
    class, modeled on the r11 punct cluster): 500 shared high-entropy
    digit tokens + one doc-specific word each, so the 12 are
    near-dups of each other (2 of 501 tokens differ -> simhash
    Hamming ~2) and a cipher that skips the digit class leaves them
    near-dup ACROSS copies too. Under the fixed cipher, a rotated
    6-digit token collides with the sister copy's set w.p. 500/1e6 —
    effectively never."""
    rng = random.Random(7)
    words = [
        "".join(rng.choice(_ALPHA) for _ in range(rng.randint(3, 9)))
        for _ in range(120)
    ]
    rows = []
    for i in range(40):
        toks = [rng.choice(words) for _ in range(rng.randint(8, 24))]
        rows.append((i, " ".join(toks)))
    digit_toks = sorted({f"{rng.randrange(10**6):06d}" for _ in range(520)})[:500]
    for j in range(N_CARRIER):
        toks = digit_toks + [words[j]]
        rows.append((40 + j, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _amplify_docs(spark, base, copies: int, cipher):
    parts = []
    for c in range(copies):
        d = base.withColumn("doc_id", F.col("doc_id") + F.lit(c * UNIT))
        parts.append(cipher(d, c))
    out = parts[0]
    for d in parts[1:]:
        out = out.unionAll(d)
    return out


def _broken_cipher(d, c: int):
    """The r11 bug class reconstructed: one character class (digits
    here, punctuation then) passes through the cipher untouched."""
    if c == 0:
        return d
    src, dst = cipher_maps(c)
    n = 2 * len(_ALPHA)  # keep letter maps, drop digits (and punct)
    return d.withColumn("text", F.translate(F.col("text"), src[:n], dst[:n]))


def test_token_invariance_red_on_unciphered_class(spark):
    base = _base_docs(spark)
    amp = _amplify_docs(spark, base, COPIES, _broken_cipher)
    rep = token_invariance_report(amp, UNIT, sample=1000)
    assert not rep["ok"]
    # every carrier doc is 500/501 invariant in every copy pair
    assert rep["suspicious_doc_pairs"] >= N_CARRIER * 3
    assert rep["max_shared_fraction"] > 0.99


def test_token_invariance_green_on_fixed_cipher(spark):
    base = _base_docs(spark)
    amp = _amplify_docs(spark, base, COPIES, doc_copy)
    rep = token_invariance_report(amp, UNIT, sample=1000)
    assert rep["ok"], rep
    # rotation coincidences (adjacent punct runs mapping onto each
    # other) may land individual tokens, never near-total overlap
    assert rep["max_shared_fraction"] < 0.9


def test_edge_mass_red_green(spark):
    base = _base_docs(spark)
    red = edge_mass_report(
        base, _amplify_docs(spark, base, COPIES, _broken_cipher), UNIT, COPIES
    )
    # The nastiest regime: carrier copies collapse to (near-)IDENTICAL
    # fingerprints, so distinct-fp edge counts stay flat (cluster
    # MEMBERSHIP explodes instead) and min-id attribution puts every
    # representative in copy 0. The same-origin proximity signal must
    # still catch it: sister fingerprints of a healthy cipher are
    # independent (Hamming ~32), these sit at <=3.
    assert not red["ok"]
    assert red["same_origin_neardup"] >= N_CARRIER  # every carrier, both pairs
    green = edge_mass_report(
        base, _amplify_docs(spark, base, COPIES, doc_copy), UNIT, COPIES
    )
    assert green["ok"], green
    assert green["same_origin_neardup"] == 0
    assert green["cross_copy_edges"] <= green["cross_budget"]


def _base_emb(spark, dim=16, n=40):
    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_red_on_diagonal_jitter(spark):
    # artifact class #2: per-(copy, dim) diagonal scale keeps
    # same-origin cross-copy cosines ~0.99
    import numpy as np

    base = _base_emb(spark)
    dim = 16

    def jitter(d, c):
        if c == 0:
            return d
        scale = np.random.RandomState(c).uniform(0.8, 1.2, dim)

        def _apply(batches, _s=scale):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["embedding"] = [
                    (np.asarray(e, dtype=np.float64) * _s).astype(np.float32)
                    for e in pdf["embedding"]
                ]
                yield pdf

        return d.mapInPandas(_apply, schema=d.schema)

    parts = []
    for c in range(COPIES):
        d = base.withColumn("vec_id", F.col("vec_id") + F.lit(c * UNIT))
        parts.append(jitter(d, c))
    amp = parts[0].unionAll(parts[1]).unionAll(parts[2])
    rep = cosine_report(amp, UNIT, sample=1000)
    assert not rep["ok"]
    assert rep["max_abs_cosine"] > COSINE_BOUND


def test_cosine_green_on_orthogonal_rotation(spark):
    import numpy as np

    base = _base_emb(spark)
    dim = 16

    def rot(d, c):
        if c == 0:
            return d
        r = _emb_rotation(c, dim)

        def _apply(batches, _r=r):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["embedding"] = [
                    (np.asarray(e, dtype=np.float64) @ _r.T).astype(np.float32)
                    for e in pdf["embedding"]
                ]
                yield pdf

        return d.mapInPandas(_apply, schema=d.schema)

    parts = []
    for c in range(COPIES):
        d = base.withColumn("vec_id", F.col("vec_id") + F.lit(c * UNIT))
        parts.append(rot(d, c))
    amp = parts[0].unionAll(parts[1]).unionAll(parts[2])
    rep = cosine_report(amp, UNIT, sample=1000)
    assert rep["ok"], rep


def test_cipher_maps_digit_class_never_wraps_to_identity():
    """ADVICE r12: the rotation branch left digits unmapped when
    c % 10 == 0 (copies 10 and 20 — an unciphered class, the exact
    artifact family these tests plant) and shared one digit mapping
    between copies c and c+10. Per-class wrap now falls back to the
    seeded permutation: every copy's digit map is a bijection, none
    is the identity, and no two copies below 26 share one."""
    digit_maps = {}
    for c in range(1, 26):
        src, dst = cipher_maps(c)
        assert len(src) == len(dst)
        assert sorted(dst) == sorted(src)  # bijection overall
        dmap = {s: d for s, d in zip(src, dst) if s in _DIGIT}
        assert sorted(dmap.values()) == sorted(_DIGIT)  # class-closed
        assert any(s != d for s, d in dmap.items()), f"identity digits at c={c}"
        digit_maps[c] = tuple(dmap[ch] for ch in _DIGIT)
    # no two copies share a digit mapping (old bug: c and c+10 did)
    assert len(set(digit_maps.values())) == len(digit_maps)


def test_validate_amplified_raises_with_all_failures(spark, tmp_path):
    base = _base_docs(spark)
    out = str(tmp_path / "corrupt")
    src = str(tmp_path / "src")
    base.write.parquet(src + "/documents.parquet")
    _amplify_docs(spark, base, COPIES, _broken_cipher).write.parquet(
        out + "/documents.parquet"
    )
    with pytest.raises(CorpusArtifactError) as ei:
        validate_amplified(
            spark, out, src, COPIES, doc_unit=UNIT, vec_unit=None, sample=1000
        )
    msg = str(ei.value)
    assert "token_invariance" in msg and "edge_mass" in msg
