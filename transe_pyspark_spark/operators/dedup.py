"""Deduplication operators (SURVEY §2B R18 + north-star dedup suite).

Generalizes the reference's ``distinct()`` vocabulary dedup
(``utils.py:13-15``) into the dedup toolkit a pretraining-data pipeline
needs:

* exact dedup           — hash aggregate on a normalization key
* n-gram Jaccard        — exact pairwise set similarity (oracle-checkable)
* MinHash + LSH banding — near-dup at scale: shingle → minhash
                          signature → band buckets → join only within
                          buckets → exact-verify candidates
* SimHash               — Hamming-bucket near-dup
* embedding cosine      — semantic near-dup (see similarity.cosine_pairs)

Scale posture: the LSH/SimHash paths never compare all pairs — the only
shuffles are groupBys on bucket keys, and the exact-verify join touches
candidate pairs only. Hash functions are fixed-parameter polynomial
hashes (not Spark-version-dependent), so signatures are stable across
runs and clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from transe_pyspark_spark.functions.text import words

#: Mersenne prime 2^31-1: modulus for shingle/minhash arithmetic. Kept
#: at 31 bits so (hash * coeff + b) stays within int64 — Spark wraps
#: silently on overflow, which would break the universal-hash property.
_MERSENNE = (1 << 31) - 1


def normalize_text(col) -> "F.Column":
    """Canonical text form for exact dedup: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def _spread_docs(sel: DataFrame) -> DataFrame:
    """Spread a per-document Arrow-kernel input across the configured
    parallelism (r15 optimization, guide §2.5/§4.2: the kernel is the
    expensive per-task work, and a small parquet is ONE scan split —
    ``documents.parquet`` at the bench SFs is a single sub-MB file, and
    even the sf1 directory packs into ~2 splits under the 128 MB +
    4 MB-open-cost packing rule — so the whole shingle/signature pass
    was running on 1-2 cores while 30 idled; measured 0.73 s serial
    for the MinHash signature pass alone at sf0.1).

    Round-robin repartition to ``spark.sql.shuffle.partitions`` ONLY
    when the incoming plan has fewer partitions than that — at real
    scale the scan already has thousands of splits and this is a
    no-op, so no extra exchange is ever paid where the data provides
    parallelism. Identical results under any partitioning: every
    kernel below is a pure per-document function and all consumers
    aggregate order-free."""
    n_part = int(sel.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if sel.rdd.getNumPartitions() < n_part:
        return sel.repartition(n_part)
    return sel


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group exact duplicates by normalized text; keep min-id canonical.
    One hash-aggregate shuffle; map-side partial agg applies.

    The aggregate keys on ``xxhash64`` of the normalized text, not the
    text itself (r08, VERDICT r07 ask #4): at corpus scale the exchange
    then carries an 8-byte key per row instead of the full document
    (the normalization still runs — narrow, map-side — but its output
    never ships). The fingerprint is used ONLY as the grouping key;
    nothing text-derived is emitted, so results are identical unless
    two *different* normalized documents collide in the 64-bit space
    (~2⁻⁶⁴ per pair; at 10⁹ docs the birthday bound is ~3·10⁻²; a
    collision would merge two groups — acceptable for dedup, where the
    incremental-state table (operators/incremental.py) already accepts
    the same fingerprint contract)."""
    return (
        df.select(
            F.col(id_col),
            F.xxhash64(normalize_text(F.col(text_col))).alias("__fp"),
        )
        .groupBy("__fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("canonical_id", "dup_count")
    )


def word_shingles(col, n: int = 3) -> "F.Column":
    """Distinct n-grams of words as an array<string> column."""
    ws = words(col)
    if n == 1:
        return F.array_distinct(ws)
    # guard: sequence(0, -1) is DESCENDING in Spark, and slice(ws, 0, n)
    # throws — short documents must yield an empty shingle set instead.
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    return F.when(F.size(ws) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i + 1, n))))
    )


def shingle_rows_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_n: int = 1
) -> DataFrame:
    """Exploded distinct word n-grams: one ``(id, shingle)`` row per
    distinct shingle per document, produced in a single Arrow batch pass
    (``mapInPandas``). Spark's higher-order-function lambdas are
    interpreted per element (10-40× slower than Arrow on this corpus —
    see ``minhash_signatures_arrow``), so the string slicing happens in
    Python over Arrow batches instead. Narrow map: no shuffle.

    Tokenization matches ``functions.text.words`` exactly (split on
    runs of SPACES only — not general whitespace — empties dropped), so
    results stay bit-identical to the DuckDB oracle's
    ``string_split_regex(trim(text), ' +')``."""
    from collections.abc import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            shs: list[str] = []
            ns: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in str(text).split(" ") if w]
                if len(ws) < shingle_n:
                    continue
                seen = {" ".join(ws[i : i + shingle_n]) for i in range(len(ws) - shingle_n + 1)}
                ids.extend([int(doc_id)] * len(seen))
                shs.extend(seen)
                ns.extend([len(seen)] * len(seen))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "shingle": pd.Series(shs, dtype=object),
                    # set size carried per row: spares callers a separate
                    # groupBy + join just to recover |A| and |B|
                    "n_shingles": pd.Series(ns, dtype="int64"),
                }
            )

    return _spread_docs(df.select(id_col, text_col)).mapInPandas(
        batches, schema=f"{id_col} long, shingle string, n_shingles long"
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact pairwise word-set Jaccard ≥ threshold (a < b) — the
    *oracle-checkable ground truth* for the LSH paths below.

    Inverted-index plan, not a cross join: explode documents to
    ``(id, shingle)`` rows (Arrow pass), build the per-shingle POSTING
    LIST with one hash aggregate, generate co-occurring pairs map-side
    by exploding each posting list against itself, and count pairs —
    that count IS ``|A∩B|``, and ``|A∪B| = |A|+|B|-|A∩B|`` from per-doc
    set sizes, so only pairs sharing ≥1 shingle are ever materialized
    (exact for any ``threshold > 0``; disjoint pairs are unreachable by
    construction, so ``threshold <= 0`` is rejected rather than
    silently incomplete). vs the equivalent exploded self-JOIN this
    shuffles the exploded table once instead of twice and evaluates the
    Arrow shingling pass once instead of once per join side (~2×
    measured). Worst case (a shingle shared by most of the corpus)
    still degenerates toward all-pairs — and additionally materializes
    that shingle's posting list on one row — hence the quadratic guard.
    NOTE the guard makes the call EAGER: ``require_bounded_input`` runs
    a ``count()`` Spark job at call time, and raises above
    ``QUADRATIC_ROW_LIMIT`` rows unless ``allow_quadratic=True`` (the
    LSH/prefix paths are the unguarded doors)."""
    from transe_pyspark_spark.operators._guards import require_bounded_input

    if threshold <= 0:
        raise ValueError(
            "jaccard_pairs requires threshold > 0: the inverted-index plan "
            "only materializes pairs sharing at least one shingle, so "
            "disjoint pairs (jaccard == 0) are never produced"
        )
    require_bounded_input(df, allow_quadratic, "jaccard_pairs")
    ex = shingle_rows_arrow(df, text_col, id_col, shingle_n)
    # __na/__nb are functionally dependent on the ids, so grouping on
    # them adds no groups — and saves the sizes aggregate + two joins
    # sort_array orders each posting list by doc id (struct compare is
    # field-order lexicographic), so generating only positional i<j
    # pairs yields each unordered pair EXACTLY once, already a<b —
    # half the rows of an a!=b generate-and-filter
    postings = (
        ex.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "n_shingles"))).alias("__ds"))
        .filter(F.size("__ds") >= 2)
    )
    pairs = postings.select(
        F.posexplode("__ds").alias("__i", "__a"), "__ds"
    ).select("__a", F.explode(F.slice("__ds", F.col("__i") + 2, F.size("__ds"))).alias("__b"))
    inter = pairs.groupBy(
        F.col(f"__a.{id_col}").alias("doc_a"),
        F.col(f"__b.{id_col}").alias("doc_b"),
        F.col("__a.n_shingles").alias("__na"),
        F.col("__b.n_shingles").alias("__nb"),
    ).agg(F.count(F.lit(1)).alias("__i"))
    # __i / (__na+__nb-__i) divides the same two integers as the oracle's
    # len(intersect)/len(union): identical IEEE doubles, hash-stable.
    jac = F.col("__i").cast("double") / (F.col("__na") + F.col("__nb") - F.col("__i")).cast("double")
    return (
        inter.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
) -> DataFrame:
    """Exact pairwise Jaccard ≥ threshold via prefix filtering
    (AllPairs/PPJoin family) — same result set as ``jaccard_pairs``,
    UNGUARDED because the candidate set is provably bounded.

    Theorem (prefix filter): order all shingles globally (rarest first —
    ascending document frequency); if two sets A, B satisfy
    ``J(A,B) ≥ t`` they must share a shingle within the first
    ``|X| − ⌈t·|X|⌉ + 1`` shingles of each set X under that order.
    Candidates therefore come from an equi-join restricted to PREFIX
    rows only — a common stop-word shingle sits at the END of the
    order, so it never generates candidates by itself — plus the length
    filter ``t·|A| ≤ |B| ∧ t·|B| ≤ |A|``. Candidates are then verified
    exactly with the same intersection-count join as ``jaccard_pairs``.

    Shuffles: doc-freq agg, per-doc window (rank shingles), prefix
    self-join, verify join, final agg — all hash-partitioned on
    shingle/doc/pair keys; nothing quadratic in the corpus."""
    ex = shingle_rows_arrow(df, text_col, id_col, shingle_n)
    return _prefix_pairs_from_rows(ex, threshold, id_col, "jaccard")


def _prefix_pairs_from_rows(
    ex: DataFrame, threshold: float, id_col: str, score_col: str
) -> DataFrame:
    """The AllPairs/PPJoin pipeline over pre-exploded ``(id, shingle,
    n_shingles)`` rows — shared by the set path (``jaccard_prefix_pairs``)
    and the multiset path (``weighted_jaccard_prefix_pairs``, which feeds
    occurrence-expanded shingles so set Jaccard on the expansion IS
    weighted Jaccard on the term frequencies)."""
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("shingle").asc())
    pos = ex.join(dfreq, "shingle").withColumn("__pos", F.row_number().over(w))
    # t·n is computed in binary floating point; for thresholds whose repr
    # rounds ABOVE the rational value (0.2, 0.4, 0.8, ...) the product
    # lands just above an exact integer, so a bare ceil would shorten the
    # prefix by one and the length filter would reject |B| == t·|A|
    # exactly — silently dropping qualifying pairs. Nudge below the
    # integer before ceil/compare; 1e-9 ≪ 1/n for any real set size.
    t = float(threshold)
    eps = 1e-9
    prefix = pos.filter(
        F.col("__pos")
        <= F.col("n_shingles") - F.ceil(F.lit(t) * F.col("n_shingles") - F.lit(eps)) + 1
    )
    pa = prefix.select(
        F.col(id_col).alias("doc_a"), "shingle",
        F.col("n_shingles").alias("__na"), F.col("__pos").alias("__pa"),
    )
    pb = prefix.select(
        F.col(id_col).alias("doc_b"), "shingle",
        F.col("n_shingles").alias("__nb"), F.col("__pos").alias("__pb"),
    )
    # PPJoin POSITIONAL filter: because both sets rank their shingles
    # by the SAME global (df, shingle) order, a shared shingle earlier
    # in A is also earlier in B — so at the pair's minimal matching
    # positions (pa, pb) every remaining shared shingle sits strictly
    # after BOTH, and overlap ≤ 1 + min(na−pa, nb−pb). Requiring that
    # bound to reach the equivalent-overlap threshold
    # ⌈t/(1+t)·(na+nb)⌉ prunes candidates the verify join could never
    # confirm (sf1 measured: 1.30M → 0.39M candidates, exact result
    # unchanged). The min-position aggregate replaces the old
    # DISTINCT — same one shuffle on the pair key.
    cands = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("__nb") >= t * F.col("__na") - eps)
            & (F.col("__na") >= t * F.col("__nb") - eps)
        )
        .groupBy("doc_a", "doc_b", "__na", "__nb")
        .agg(F.min("__pa").alias("__mpa"), F.min("__pb").alias("__mpb"))
        .filter(
            F.lit(1)
            + F.least(F.col("__na") - F.col("__mpa"), F.col("__nb") - F.col("__mpb"))
            >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("__na") + F.col("__nb")) - F.lit(eps))
        )
        .select("doc_a", "doc_b", "__na", "__nb")
    )
    # exact verify: replicate A's shingles per candidate partner, then
    # probe B's (id, shingle) rows — intersection size per pair
    ea = ex.select(F.col(id_col).alias("doc_a"), "shingle")
    eb = ex.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        cands.join(ea, "doc_a")
        .join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "__na", "__nb")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    jac = F.col("__i").cast("double") / (F.col("__na") + F.col("__nb") - F.col("__i")).cast("double")
    return (
        inter.select("doc_a", "doc_b", jac.alias(score_col))
        .filter(F.col(score_col) >= threshold)
        .select("doc_a", "doc_b", F.round(score_col, 6).alias(score_col))
    )


def containment_prefix_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact ASYMMETRIC containment ``C(A→B) = |A∩B| / |A| ≥ t`` for
    ordered pairs a ≠ b — the quote/boilerplate/subset-document
    detector Jaccard misses: a paragraph fully quoted inside a long
    document has tiny Jaccard (the union is huge) but containment 1.0.
    Near-dedup pipelines use it to drop documents SUBSUMED by another
    rather than merely similar.

    One-sided prefix filter (the PPJoin prefix theorem applied to the
    contained side only): if ``C(A→B) ≥ t`` then ``|A∩B| ≥ ⌈t·|A|⌉``,
    so under the global rarest-first shingle order A must match B
    within A's first ``|A| − ⌈t·|A|⌉ + 1`` shingles (pigeonhole — all
    matches outside that prefix would leave fewer than ``t·|A|``
    shared). B cannot be prefix-restricted (a containing document
    matches anywhere), so candidates come from A-prefix rows against
    the FULL posting side, pruned by

    * the size bound ``|B| ≥ ⌈t·|A|⌉`` (overlap can't exceed |B|), and
    * the positional bound at the pair's minimal matching positions:
      remaining overlap ≤ 1 + min(|A|−pa, |B|−pb), required ≥ ⌈t·|A|⌉.

    Candidates then verify EXACTLY with the same replicate-and-probe
    intersection count as ``jaccard_prefix_pairs``. Shuffles: doc-freq
    agg, per-doc rank window, prefix⋈full equi-join on the shingle,
    verify join, pair agg — all keyed, nothing quadratic in the
    corpus; a stop-shingle sits last in the order so it generates no
    A-prefix candidates by itself (B-side posting lists stay long, but
    only pairs seeded by some rare prefix shingle ever materialize).

    Returns (doc_a, doc_b, containment): fraction of A's distinct
    ``shingle_n``-gram set present in B, ≥ ``threshold``, both
    directions reported independently. One IEEE division of two
    integers — hash-exact on any engine.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"containment threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    eps = 1e-9
    ex = shingle_rows_arrow(df, text_col, id_col, shingle_n)
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("shingle").asc())
    pos = ex.join(dfreq, "shingle").withColumn("__pos", F.row_number().over(w))
    # A side: prefix rows only (see jaccard_prefix_pairs for the
    # float-nudge rationale on t·n landing just above an integer)
    pa = pos.filter(
        F.col("__pos")
        <= F.col("n_shingles") - F.ceil(F.lit(t) * F.col("n_shingles") - F.lit(eps)) + 1
    ).select(
        F.col(id_col).alias("doc_a"), "shingle",
        F.col("n_shingles").alias("__na"), F.col("__pos").alias("__pa"),
    )
    # B side: every row, with positions for the positional bound
    pb = pos.select(
        F.col(id_col).alias("doc_b"), "shingle",
        F.col("n_shingles").alias("__nb"), F.col("__pos").alias("__pb"),
    )
    need = F.ceil(F.lit(t) * F.col("__na") - F.lit(eps))
    cands = (
        pa.join(pb, "shingle")
        .filter((F.col("doc_a") != F.col("doc_b")) & (F.col("__nb") >= need))
        .groupBy("doc_a", "doc_b", "__na", "__nb")
        .agg(F.min("__pa").alias("__mpa"), F.min("__pb").alias("__mpb"))
        .filter(
            F.lit(1) + F.least(F.col("__na") - F.col("__mpa"), F.col("__nb") - F.col("__mpb"))
            >= F.ceil(F.lit(t) * F.col("__na") - F.lit(eps))
        )
        .select("doc_a", "doc_b", "__na")
    )
    ea = ex.select(F.col(id_col).alias("doc_a"), "shingle")
    eb = ex.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        cands.join(ea, "doc_a")
        .join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "__na")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    cont = F.col("__i").cast("double") / F.col("__na").cast("double")
    return (
        inter.select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", F.round("containment", 6).alias("containment"))
    )


def _word_hashes(col) -> "F.Column":
    """Deterministic 31-bit polynomial hash per word (base-131 over code
    points, mod 2^31−1) — engine-independent, unlike F.hash/xxhash whose
    values are Spark implementation details."""
    def poly_hash(s):
        chars = F.split(s, "")
        return F.aggregate(
            chars,
            F.lit(7).cast("long"),
            lambda acc, ch: (acc * 131 + F.coalesce(F.ascii(ch), F.lit(0))) % F.lit(_MERSENNE),
        )

    return F.transform(words(col), poly_hash)


def _shingles_from_word_hashes(wh, shingle_n: int) -> "F.Column":
    """Distinct shingle hashes from a MATERIALIZED array<long> column of
    per-word hashes (combine the n word hashes polynomially).

    ``wh`` must be a plain column reference, not a composed expression:
    Catalyst does not common-subexpression-eliminate across the
    ``element_at`` references below, so an inlined expression would be
    re-evaluated ``shingle_n`` times per shingle (measured 8-20× blowup
    on the documents fixture). Callers project ``_word_hashes`` into a
    column first."""
    if shingle_n == 1:
        return F.array_distinct(wh)

    def comb(i):
        acc = F.element_at(wh, i)
        for j in range(1, shingle_n):
            # acc < p < 2^31 and 131313·p + p < 2^49: no int64 overflow
            acc = (acc * 131313 + F.element_at(wh, i + j)) % F.lit(_MERSENNE)
        return acc

    idx = F.sequence(F.lit(1), F.size(wh) - (shingle_n - 1))
    return F.when(F.size(wh) < shingle_n, F.array().cast("array<long>")).otherwise(
        F.array_distinct(F.transform(idx, comb))
    )


def _with_shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int, out_col: str = "__h"
) -> DataFrame:
    """[id, __h: array<long>] with word hashes materialized between the
    two projections (see _shingles_from_word_hashes)."""
    return (
        df.select(F.col(id_col), _word_hashes(F.col(text_col)).alias("__wh"))
        .select(F.col(id_col), _shingles_from_word_hashes(F.col("__wh"), shingle_n).alias(out_col))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    (aᵢ·h + bᵢ mod p). Entirely JVM-side higher-order functions — one
    narrow pass over documents, no shuffle, no Python."""
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]

    def perm(a: int, b: int):
        # NB: Spark infers HOF-lambda arity from the Python signature,
        # so coefficients must be closed over, not default-arg-bound.
        return lambda h: (h * a + b) % F.lit(_MERSENNE)

    sig = F.array(*[F.array_min(F.transform(F.col("__h"), perm(a, b))) for a, b in coeffs])
    return (
        _with_shingle_hashes(df, text_col, id_col, shingle_n)
        .filter(F.size("__h") > 0)
        .select(F.col(id_col), sig.alias("signature"))
    )


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    include_hashes: bool = False,
) -> DataFrame:
    """MinHash signatures via Arrow-batched NumPy (``mapInPandas``) —
    the scale path. Spark's higher-order-function lambdas are
    interpreted per element (never whole-stage codegen'd), so the pure-
    JVM variant above pays ~64×|shingles| interpreted ops per document;
    here the affine permutations are one vectorized (64, m) matrix op
    per document. Shingle hashing is CRC32 (fixed algorithm → stable
    across runs/engines). Still a narrow map: no shuffle, no driver."""
    import random
    import zlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rng = random.Random(seed)
    A = np.array([rng.randrange(1, _MERSENNE) for _ in range(num_hashes)], dtype=np.int64)
    B = np.array([rng.randrange(0, _MERSENNE) for _ in range(num_hashes)], dtype=np.int64)

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[int] = []
            out_sigs: list[list[int]] = []
            out_hashes: list[list[int]] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = str(text).split()
                if len(ws) < shingle_n:
                    continue
                sh = {" ".join(ws[i : i + shingle_n]) for i in range(len(ws) - shingle_n + 1)}
                h = np.fromiter(
                    (zlib.crc32(s.encode("utf-8")) % _MERSENNE for s in sh),
                    dtype=np.int64,
                    count=len(sh),
                )
                sig = ((A[:, None] * h[None, :] + B[:, None]) % _MERSENNE).min(axis=1)
                out_ids.append(int(doc_id))
                out_sigs.append(sig.tolist())
                if include_hashes:
                    out_hashes.append(np.unique(h).tolist())
            # explicit dtypes: an all-skipped batch would otherwise emit
            # object-dtype empty columns Arrow can't cast to long
            cols = {id_col: pd.Series(out_ids, dtype="int64"),
                    "signature": pd.Series(out_sigs, dtype=object)}
            if include_hashes:
                cols["hashes"] = pd.Series(out_hashes, dtype=object)
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, signature array<long>"
    if include_hashes:
        schema += ", hashes array<long>"
    return _spread_docs(df.select(id_col, text_col)).mapInPandas(sig_batches, schema=schema)


def band_keys(sigs: DataFrame, bands: int, rows_per_band: int, id_col: str = "doc_id") -> DataFrame:
    """Explode a ``[id, signature]`` frame into LSH band-bucket keys:
    one row per (id, band) with ``bucket`` = hash of that band's
    signature slice. Shared by the one-shot pair finder and the
    incremental cross-drop near-dedup (the state side re-derives its
    bands from stored signatures with this same expression, so bucket
    values stay comparable across drops)."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(F.concat_ws(",", F.transform(F.slice("signature", b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    verify: bool = True,
    impl: str = "arrow",
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding.

    Pipeline: signatures (narrow) → explode into ``bands`` band-keys →
    self-join on (band, band_hash) = candidate pairs (shuffle is on
    bucket keys only — all-pairs never materializes) → optional exact
    Jaccard verify of candidates. With 64 hashes / 16 bands (r=4) the
    S-curve midpoint sits near s ≈ (1/16)^(1/4) ≈ 0.5.
    """
    rows_per_band = num_hashes // bands
    if impl == "arrow":
        # one Arrow pass yields both the signature (banding) and the
        # distinct shingle-hash set (exact verify) — the verify join
        # then works on integer arrays instead of re-deriving string
        # shingles twice through interpreted HOFs.
        sigs = minhash_signatures_arrow(
            df, text_col, id_col, num_hashes, shingle_n, seed, include_hashes=verify
        ).cache()
    else:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, seed).cache()
    banded = band_keys(sigs, bands, rows_per_band, id_col)

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col(f"a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    if not verify:
        return cands
    if impl == "arrow":
        sh = sigs.select(F.col(id_col), F.col("hashes").alias("__sh"))
    else:
        sh = df.select(F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh"))
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sa"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    jac = F.when(union == 0.0, F.lit(0.0)).otherwise(inter / union)
    return (
        cands.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _cc_round(edges, labels):
    """One min-label propagation round, un-pinned — the body of
    ``connected_components``' loop, exposed so the plan gate can
    explain the per-round shape (the converged result is an opaque
    localCheckpoint by design): one dst-keyed equi-join over the
    pinned doubled edge set + one hash aggregate (min neighbor label)
    + one node-keyed left join folding the min back into the labels —
    never a window, never anything quadratic."""
    neighbor_min = (
        edges.join(labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "__nc"), "dst")
        .groupBy("src")
        .agg(F.min("__nc").alias("__min_nc"))
    )
    return (
        labels.join(neighbor_min.withColumnRenamed("src", "id"), "id", "left")
        .select(
            "id",
            F.least(F.col("component"), F.coalesce(F.col("__min_nc"), F.col("component"))).alias("component"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a similarity-pair edge list →
    ``[id, component]`` with component = min node id in the component.

    Near-dup *pairs* don't dedup a corpus by themselves — transitively
    connected documents must collapse into one cluster before choosing
    canonicals. Implementation is Pregel-style min-label propagation:
    each iteration every node takes the min of its own label and its
    neighbors' labels (one join + one aggregation per iteration,
    lineage truncated with localCheckpoint). Iterations needed = graph
    diameter, which for near-dup clusters is tiny; hard-capped at
    ``max_iter``. This is the standard scalable formulation — no
    driver-side union-find, state is one row per node.
    """
    # repartition on the propagation join key BEFORE caching (r07, the
    # pagerank_integer precedent): InMemoryRelation preserves the
    # partitioning, so every iteration's edges ⨝ labels join streams
    # the big edge side without a fresh Exchange — uncached-or-
    # unkeyed, the edge table re-shuffled once per iteration
    n_part = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # doubled edges exploded in-plan from ONE pass over the pair list —
    # a union of two projections would re-execute the (often expensive:
    # LSH banding, semantic cell join) upstream pair subtree once per
    # branch at materialization (the lpa_communities precedent)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.*")
        .distinct()
        .repartition(n_part, "dst")
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        updated = _cc_round(edges, labels).localCheckpoint()
        changed = (
            updated.alias("u")
            .join(labels.alias("o"), "id")
            .filter(F.col("u.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    edges.unpersist()
    return labels


def near_dedup_canonical(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    method: str = "minhash",
) -> DataFrame:
    """Corpus-level near-dedup: near-dup pairs → connected components →
    keep the min-id document per cluster (singletons kept implicitly).
    Returns ``[doc_id, keep: boolean]``.

    ``method="minhash"`` (default) is the bucketed LSH scale path;
    ``method="exact"`` scores exact pairwise Jaccard — deterministic and
    SQL-expressible (it backs the driver-checked ``near_dedup_keep``
    oracle) but O(n²), so it inherits ``jaccard_pairs``' bounded-input
    guard."""
    if method == "exact":
        pairs = jaccard_pairs(df, threshold=threshold, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    else:
        pairs = minhash_lsh_pairs(df, threshold=threshold, text_col=text_col, id_col=id_col, shingle_n=shingle_n)
    comps = connected_components(pairs)
    canonical = comps.groupBy("component").agg(F.min("id").alias("__keep_id"))
    keep_map = comps.join(canonical, "component").select(
        F.col("id").alias(id_col), (F.col("id") == F.col("__keep_id")).alias("keep")
    )
    return (
        df.select(id_col)
        .join(keep_map, id_col, "left")
        .select(id_col, F.coalesce("keep", F.lit(True)).alias("keep"))
    )


def simhash_from_hashes(hashes, bits: int = 64) -> "F.Column":
    """SimHash fingerprint from a materialized array<long> of shingle
    hashes: bit b of the fingerprint is 1 iff Σ_shingles (±1 by
    shingle-hash bit b) > 0. Single pass with an array-of-counters
    accumulator (one nested HOF), NOT one aggregate per bit — the
    per-bit formulation re-evaluates the input ``bits`` times and is
    ~30× slower.
    """
    bits = min(bits, 61)
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda c, p: c + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(counts, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_fingerprints_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    shingle_n: int = 1,
) -> DataFrame:
    """SimHash fingerprints via Arrow-batched NumPy — the scale path
    (same rationale as minhash_signatures_arrow: interpreted HOF
    aggregation allocates a counters array per shingle; here the whole
    (m, bits) sign matrix is one vectorized op per document)."""
    import zlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    bits = min(bits, 61)
    shifts = np.arange(bits, dtype=np.int64)
    powers = (np.int64(1) << shifts).astype(np.int64)

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids: list[int] = []
            out_fps: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = str(text).split()
                if len(ws) < shingle_n:
                    continue
                sh = {" ".join(ws[i : i + shingle_n]) for i in range(len(ws) - shingle_n + 1)}
                h = np.fromiter(
                    (zlib.crc32(s.encode("utf-8")) % _MERSENNE for s in sh),
                    dtype=np.int64,
                    count=len(sh),
                )
                signs = 2 * ((h[:, None] >> shifts[None, :]) & 1) - 1  # (m, bits) ±1
                fp = int(powers[signs.sum(axis=0) > 0].sum())
                out_ids.append(int(doc_id))
                out_fps.append(fp)
            yield pd.DataFrame(
                {id_col: pd.Series(out_ids, dtype="int64"),
                 "__fp": pd.Series(out_fps, dtype="int64")}
            )

    return _spread_docs(df.select(id_col, text_col)).mapInPandas(fp_batches, schema=f"{id_col} long, __fp long")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    shingle_n: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """Near-dup candidates whose SimHash fingerprints differ in ≤
    ``max_hamming`` bits. Blocking: split the fingerprint into
    ``max_hamming+1`` bands — any pair within the Hamming radius shares
    at least one exact band (pigeonhole), so the join is on band keys,
    never all-pairs."""
    n_bands = max_hamming + 1
    band_width = bits // n_bands
    if impl == "arrow":
        fp = simhash_fingerprints_arrow(df, text_col, id_col, bits, shingle_n)
    else:
        fp = _with_shingle_hashes(df, text_col, id_col, shingle_n).select(
            F.col(id_col), simhash_from_hashes(F.col("__h"), bits).alias("__fp")
        )
    pieces = []
    for band in range(n_bands):
        shift = band * band_width
        width = band_width if band < n_bands - 1 else bits - shift
        key = ((F.col("__fp") / F.lit(1 << shift)).cast("long") % F.lit(1 << width))
        pieces.append(fp.select(F.col(id_col), F.lit(band).alias("band"), key.alias("bucket"), F.col("__fp")))
    banded = pieces[0]
    for p in pieces[1:]:
        banded = banded.unionByName(p)

    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.__fp").alias("__fa"),
            F.col("b.__fp").alias("__fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cands.select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def cross_source_dup_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Corpus-provenance duplication matrix (r08): for every ordered
    source pair ``source_a <= source_b``, the EXACT number of duplicate
    document pairs whose normalized texts are identical and whose
    members come from those two sources — within-source rows
    (``a == b``) count C(n,2) internal duplicates, cross rows count
    n_a·n_b. The "which crawl re-hosts which" forensics view a corpus
    curator reads before choosing per-source dedup order.

    Plan: the same xxhash64(normalized-text) fingerprint keying as
    ``exact_dup_groups`` (the exchange carries 8-byte keys, never
    text), one (fp, source) hash-agg, then a fp-keyed equi-self-join of
    that per-group-per-source count table (group cardinality per fp is
    ≤|sources| — tiny) and a ≤|sources|² rollup. Nothing is quadratic
    in documents.

    Returns (source_a, source_b, dup_pairs), dup_pairs > 0 rows only.
    """
    per = (
        df.select(
            F.xxhash64(normalize_text(F.col(text_col))).alias("__fp"),
            F.col(source_col).alias("__s"),
        )
        .groupBy("__fp", "__s")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        # two consumers (both self-join sides — their post-shuffle
        # projections differ, so AQE ReusedExchange does NOT dedup
        # them): pinned so the corpus scan + fingerprint agg run once
        # (r14 guard class); the frame carries only (hash, source,
        # count) — 8-byte keys, never text. persist() keeps the
        # gate-visible lineage and the __fp partitioning both join
        # sides reuse. RELEASED before return under the family's
        # eager-cleanup contract (ADVICE r14 — the doc_keywords idiom);
        # eager_cleanup=False keeps the lazy gate-visible lineage and
        # leaves the pin (CacheManager-deduped, eviction-bounded).
        .persist()
    )
    a = per.select("__fp", F.col("__s").alias("source_a"), F.col("__n").alias("__na"))
    b = per.select("__fp", F.col("__s").alias("source_b"), F.col("__n").alias("__nb"))
    pairs = (
        a.join(b, "__fp")
        .filter(F.col("source_a") <= F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.when(
                F.col("source_a") == F.col("source_b"),
                F.expr("__na * (__na - 1) div 2"),
            )
            .otherwise(F.col("__na") * F.col("__nb"))
            .cast("long")
            .alias("__p"),
        )
    )
    out = (
        pairs.groupBy("source_a", "source_b")
        .agg(F.sum("__p").cast("long").alias("dup_pairs"))
        .filter(F.col("dup_pairs") > 0)
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # ≤|sources|²-row leaf
    per.unpersist()
    return out


# ---------------------------------------------------------------------------
# Weighted (multiset / term-frequency) similarity — bridges the set-dedup
# family (R18) and the vector-similarity family (R17): the same posting-
# list machinery, but each term counts as many times as it occurs.
# ---------------------------------------------------------------------------


def tf_rows_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    expand: bool = False,
    shingle_n: int = 1,
) -> DataFrame:
    """Exploded TERM-FREQUENCY rows in one Arrow batch pass (narrow map,
    no shuffle — the multiset sibling of ``shingle_rows_arrow``).

    ``expand=False`` (default): one ``(id, term, tf, doc_len)`` row per
    distinct term per document, ``doc_len`` = Σ tf (the document's total
    token count), carried per row so callers never re-aggregate it.

    ``expand=True``: the OCCURRENCE EXPANSION — ``(id, shingle,
    n_shingles)`` rows where the k-th occurrence of a term becomes the
    distinct pseudo-shingle ``term⟂k`` (``\\x01`` separator, unreachable
    by space-split tokens) and ``n_shingles = doc_len``. Identity used
    by the scale path: for multisets A, B with expansions Â, B̂,
    ``|Â ∩ B̂| = Σ_t min(tf_A, tf_B)`` and ``|Â ∪ B̂| = Σ_t max`` —
    so SET Jaccard on the expansion IS weighted Jaccard on the term
    frequencies, and the whole AllPairs/PPJoin prefix-filter theory
    applies unchanged. Expansion factor is doc_len / n_distinct_terms
    (≈2-3× on natural text), not quadratic in anything.

    ``shingle_n > 1`` counts word n-GRAM occurrences instead of single
    words (``doc_len`` becomes the gram count ``|words| − n + 1``;
    shorter docs yield no rows) — the multiset that makes repeated
    PARAGRAPHS visible: a doc that pastes one passage 5× repeats every
    gram of it 5×, and — decisive for the prefix-filter scale path —
    n-gram (pseudo-)shingles are nearly corpus-unique, so posting
    lists stay family-sized where unigram lists go corpus-dense.

    Tokenization matches ``functions.text.words`` (split on runs of
    spaces, empties dropped), so the DuckDB oracle's
    ``string_split_regex(trim(text), ' +')`` sees identical multisets."""
    from collections.abc import Iterator
    from collections import Counter

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            lens: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in str(text).split(" ") if w]
                if len(ws) < shingle_n:
                    continue
                if shingle_n > 1:
                    ws = [
                        " ".join(ws[i : i + shingle_n])
                        for i in range(len(ws) - shingle_n + 1)
                    ]
                counts = Counter(ws)
                n = len(ws)
                if expand:
                    for term, tf in counts.items():
                        for k in range(tf):
                            ids.append(int(doc_id))
                            terms.append(f"{term}\x01{k}")
                            lens.append(n)
                else:
                    for term, tf in counts.items():
                        ids.append(int(doc_id))
                        terms.append(term)
                        tfs.append(tf)
                        lens.append(n)
            if expand:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids, dtype="int64"),
                        "shingle": pd.Series(terms, dtype=object),
                        "n_shingles": pd.Series(lens, dtype="int64"),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        id_col: pd.Series(ids, dtype="int64"),
                        "term": pd.Series(terms, dtype=object),
                        "tf": pd.Series(tfs, dtype="int64"),
                        "doc_len": pd.Series(lens, dtype="int64"),
                    }
                )

    schema = (
        f"{id_col} long, shingle string, n_shingles long"
        if expand
        else f"{id_col} long, term string, tf long, doc_len long"
    )
    return _spread_docs(df.select(id_col, text_col)).mapInPandas(batches, schema=schema)


def weighted_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact pairwise WEIGHTED Jaccard ≥ threshold (a < b) over term
    frequencies: ``J_w = Σ min(tf_A, tf_B) / Σ max(tf_A, tf_B)`` — the
    multiset generalization of ``jaccard_pairs`` (repeated boilerplate
    counts; a doc that repeats one paragraph 5× no longer looks like its
    single-copy source, which set Jaccard cannot distinguish).

    Same inverted-index plan as ``jaccard_pairs``: per-term posting
    lists of ``(id, tf, doc_len)`` structs, positional i<j pair
    generation map-side, then ONE hash aggregate computing
    ``I = Σ min(tf_a, tf_b)`` per pair — exact BIGINT. The denominator
    needs no second pass: ``Σ max = len_A + len_B − I`` (mirroring
    ``|A∪B| = |A|+|B|−|A∩B|``). Pairs sharing no term are unreachable
    (J_w = 0), so any ``threshold > 0`` is exact. Guarded eager like its
    set sibling; ``weighted_jaccard_prefix_pairs`` is the unguarded
    scale door."""
    from transe_pyspark_spark.operators._guards import require_bounded_input

    if threshold <= 0:
        raise ValueError(
            "weighted_jaccard_pairs requires threshold > 0: only pairs "
            "sharing at least one term are ever materialized"
        )
    require_bounded_input(df, allow_quadratic, "weighted_jaccard_pairs")
    tf = tf_rows_arrow(df, text_col, id_col, shingle_n=shingle_n)
    postings = (
        tf.groupBy("term")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "tf", "doc_len"))).alias("__ds"))
        .filter(F.size("__ds") >= 2)
    )
    pairs = postings.select(
        F.posexplode("__ds").alias("__i", "__a"), "__ds"
    ).select("__a", F.explode(F.slice("__ds", F.col("__i") + 2, F.size("__ds"))).alias("__b"))
    inter = pairs.groupBy(
        F.col(f"__a.{id_col}").alias("doc_a"),
        F.col(f"__b.{id_col}").alias("doc_b"),
        F.col("__a.doc_len").alias("__la"),
        F.col("__b.doc_len").alias("__lb"),
    ).agg(F.sum(F.least(F.col("__a.tf"), F.col("__b.tf"))).cast("long").alias("__i"))
    # same two integers as the oracle's Σmin / (la+lb−Σmin): identical
    # IEEE doubles, hash-stable
    wj = F.col("__i").cast("double") / (F.col("__la") + F.col("__lb") - F.col("__i")).cast("double")
    return (
        inter.select("doc_a", "doc_b", wj.alias("wjaccard"))
        .filter(F.col("wjaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("wjaccard", 6).alias("wjaccard"))
    )


def weighted_jaccard_prefix_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
) -> DataFrame:
    """Exact weighted Jaccard ≥ threshold via PREFIX FILTERING — same
    result set as ``weighted_jaccard_pairs``, UNGUARDED because the
    candidate set is provably bounded (the 100 TB door).

    Rides the occurrence-expansion identity (``tf_rows_arrow``
    ``expand=True``): weighted Jaccard over term frequencies equals SET
    Jaccard over occurrence-expanded pseudo-shingles, so the exact
    AllPairs/PPJoin pipeline (global rarest-first order, prefix-only
    candidate equi-join, length filter, positional overlap bound,
    keyed verify join — ``_prefix_pairs_from_rows``) applies verbatim.
    The expansion also sharpens the filter for free: a term occurring
    5× in one doc and 1× in another matches on only ONE pseudo-shingle
    (``term⟂0``), so high-tf boilerplate stops generating cross-doc
    candidates beyond the shared multiplicity.

    SCALE CAVEAT — pick ``shingle_n`` by corpus shape: at ``shingle_n=1``
    the pseudo-shingle space is the vocabulary, and inside a family of
    lexically-similar documents (one template, many instances) even the
    RAREST unigrams are family-wide, so prefix candidates grow with
    |family|² — bounded, but quadratic in the family, not the corpus.
    ``shingle_n>=3`` grams are nearly corpus-unique (the benched 10×
    configuration, like the set path's ``jaccard_prefix_near_pairs``),
    keeping posting lists near-dup-sized; repeated-paragraph inflation
    is still fully visible because a pasted passage repeats all its
    grams."""
    ex = tf_rows_arrow(df, text_col, id_col, expand=True, shingle_n=shingle_n)
    return _prefix_pairs_from_rows(ex, threshold, id_col, "wjaccard")


def tf_cosine_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    allow_quadratic: bool = False,
) -> DataFrame:
    """Exact pairwise COSINE over raw term-frequency vectors ≥ threshold
    (a < b) — the lexical bridge between the dedup family (R18) and the
    embedding-similarity family (R17): same sparse-vector math as
    ``similarity.cosine_pairs``, but the vectors are term counts and the
    plan is the inverted index, not a dense-vector join.

    ``cos = Σ tf_A·tf_B / (√Σtf_A² · √Σtf_B²)``: the dot product folds
    as exact BIGINT inside one hash aggregate over per-term posting
    pairs (tf products are ≤ doc_len², far inside int64); per-doc
    squared norms fold BIGINT in the same Arrow-fed aggregate tree and
    ride the posting structs, so no separate norm join. Only the final
    ``√·√`` division is IEEE double, with the same expression shape as
    the DuckDB oracle (sqrt is correctly rounded — bit-identical both
    engines). Pairs sharing no term are unreachable (cos = 0), so any
    ``threshold > 0`` is exact.

    Guarded eager: this is the oracle-checkable ground truth. The scale
    paths for cosine live in ``similarity``: LSH / IVF over embeddings,
    ``semantic_near_pairs`` for SemDeDup-style near-dup."""
    from transe_pyspark_spark.operators._guards import require_bounded_input

    if threshold <= 0:
        raise ValueError(
            "tf_cosine_pairs requires threshold > 0: only pairs sharing "
            "at least one term are ever materialized"
        )
    require_bounded_input(df, allow_quadratic, "tf_cosine_pairs")
    tf = tf_rows_arrow(df, text_col, id_col)
    # squared norm per doc, folded once and carried into the postings
    norms = tf.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("__n2")
    )
    rows = tf.join(norms, id_col)
    postings = (
        rows.groupBy("term")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "tf", "__n2"))).alias("__ds"))
        .filter(F.size("__ds") >= 2)
    )
    pairs = postings.select(
        F.posexplode("__ds").alias("__i", "__a"), "__ds"
    ).select("__a", F.explode(F.slice("__ds", F.col("__i") + 2, F.size("__ds"))).alias("__b"))
    dots = pairs.groupBy(
        F.col(f"__a.{id_col}").alias("doc_a"),
        F.col(f"__b.{id_col}").alias("doc_b"),
        F.col("__a.__n2").alias("__na2"),
        F.col("__b.__n2").alias("__nb2"),
    ).agg(F.sum(F.col("__a.tf") * F.col("__b.tf")).cast("long").alias("__dot"))
    cos = F.col("__dot").cast("double") / (
        F.sqrt(F.col("__na2").cast("double")) * F.sqrt(F.col("__nb2").cast("double"))
    )
    return (
        dots.select("doc_a", "doc_b", cos.alias("tf_cosine"))
        .filter(F.col("tf_cosine") >= threshold)
        .select("doc_a", "doc_b", F.round("tf_cosine", 6).alias("tf_cosine"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
# the MOSS local-similarity algorithm): guaranteed detection of shared
# runs with a bounded fingerprint density, where MinHash only bounds
# WHOLE-document resemblance.
# ---------------------------------------------------------------------------


def winnow_fingerprint_rows_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowed fingerprints per document — one Arrow batch
    pass (narrow, no shuffle), emitting ``(id, fp, n_fps)`` rows.

    Winnowing: hash every k-gram, slide a window of ``w`` consecutive
    gram hashes, keep each window's MINIMUM. Guarantees: any shared run
    of ≥ w+k−1 words yields at least one shared fingerprint (every
    window inside the run selects from the same hashes), and density is
    bounded at ~2/(w+1) fingerprints per gram — tunable recall/cost,
    per-position evidence, unlike MinHash's whole-document resemblance
    bound. Documents shorter than one window keep the min of all their
    grams (standard boundary rule), so every ≥k-word doc has ≥1
    fingerprint.

    Hashes are the module's engine-independent polynomial family
    (base-131 code-point word hashes, base-131313 gram combine, mod
    2³¹−1 — the ``_word_hashes`` / ``_shingles_from_word_hashes``
    constants), so a DuckDB oracle replays every fingerprint exactly;
    nothing depends on Spark's hash implementation."""
    from collections.abc import Iterator

    import pandas as pd

    if k < 1 or w < 1:
        raise ValueError("winnowing needs k >= 1 and w >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            out_fps: list[int] = []
            ns: list[int] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = [x for x in str(text).split(" ") if x]
                if len(ws) < k:
                    continue
                wh = []
                for word in ws:
                    acc = 7
                    for ch in word:
                        acc = (acc * 131 + ord(ch)) % _MERSENNE
                    wh.append(acc)
                grams = []
                for i in range(len(wh) - k + 1):
                    acc = wh[i]
                    for j in range(1, k):
                        acc = (acc * 131313 + wh[i + j]) % _MERSENNE
                    grams.append(acc)
                if len(grams) <= w:
                    sel = {min(grams)}
                else:
                    sel = {
                        min(grams[i : i + w])
                        for i in range(len(grams) - w + 1)
                    }
                ids.extend([int(doc_id)] * len(sel))
                out_fps.extend(sorted(sel))
                ns.extend([len(sel)] * len(sel))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "fp": pd.Series(out_fps, dtype="int64"),
                    "n_fps": pd.Series(ns, dtype="int64"),
                }
            )

    return _spread_docs(df.select(id_col, text_col)).mapInPandas(
        batches, schema=f"{id_col} long, fp long, n_fps long"
    )


def winnow_pairs(
    df: DataFrame,
    min_shared: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowed fingerprints
    (a < b) — MOSS-style LOCAL similarity: a pasted span of ≥ w+k−1
    words contributes fingerprints wherever it lands, so partial
    plagiarism/boilerplate reuse surfaces even when whole-document
    resemblance (Jaccard, MinHash) stays low.

    Plan: one narrow Arrow fingerprint pass, then the inverted-index
    posting pattern (``jaccard_pairs``): per-fingerprint posting lists,
    positional i<j pair generation, ONE hash aggregate counting shared
    fingerprints — exact BIGINTs end to end, no floats anywhere.
    UNGUARDED like the prefix paths: winnowed k-gram fingerprints are
    near-unique outside genuinely shared runs (density ~2/(w+1) of
    grams), so posting lists stay reuse-sized, never corpus-dense.

    Returns (doc_a, doc_b, n_shared, nf_a, nf_b) — the caller picks a
    containment-style score (e.g. n_shared / min(nf)) downstream; this
    operator stays in exact integers."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1 (0 would require all pairs)")
    ex = winnow_fingerprint_rows_arrow(df, text_col, id_col, k, w)
    postings = (
        ex.groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "n_fps"))).alias("__ds"))
        .filter(F.size("__ds") >= 2)
    )
    pairs = postings.select(
        F.posexplode("__ds").alias("__i", "__a"), "__ds"
    ).select("__a", F.explode(F.slice("__ds", F.col("__i") + 2, F.size("__ds"))).alias("__b"))
    return (
        pairs.groupBy(
            F.col(f"__a.{id_col}").alias("doc_a"),
            F.col(f"__b.{id_col}").alias("doc_b"),
            F.col("__a.n_fps").alias("nf_a"),
            F.col("__b.n_fps").alias("nf_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_a", "doc_b", "n_shared", "nf_a", "nf_b")
    )


def golden_record(
    df: DataFrame,
    group_expr,
    id_col: str,
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    mode_cols: tuple[str, ...] = (),
    min_members: int = 2,
    eager_cleanup: bool = True,
) -> DataFrame:
    """SURVIVORSHIP merge — the master-data-management step AFTER
    duplicate detection: where ``near_dedup_keep`` picks one surviving
    ROW per duplicate group, this synthesizes one golden record
    per group FIELD BY FIELD (latest address from one copy, longest
    description from another, majority-vote category) — the rule-based
    merge every entity-resolution pipeline ends with.

    Rules (all exact, all deterministic): ``min_cols``/``max_cols``
    take the group min/max; ``mode_cols`` take the group's most
    frequent value with ties broken by SMALLEST value (a stated total
    order — engines disagree on unspecified mode tie-breaks, so the
    repo never leaves one unstated). NULLs lose every rule (Spark
    min/max and the count aggregate skip them).

    Plan: groups key on ``group_expr`` (e.g. the normalized text, a
    cluster id from ``near_dup_components``). Min/max ride ONE group
    hash-aggregate; each mode column pays one (group, value) count
    aggregate + one group re-aggregate, where the argmax is
    ``min(struct(-count, value))`` — no window, no sort. The pieces
    (each |groups|-sized) join on the group key. Only groups with
    ``min_members`` or more rows survive (the singleton groups are not
    duplicates and need no merging). The projected input pins once
    (``1 + |mode_cols|`` consumers) under the family's eager-cleanup
    contract.

    Returns (canonical_id = min id, n_members, min_<c>.., max_<c>..,
    mode_<c>..).
    """
    g = (F.col(group_expr) if isinstance(group_expr, str) else group_expr).alias("__g")
    base = df.select(
        g,
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in dict.fromkeys([*min_cols, *max_cols, *mode_cols])],
    ).cache()
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_members"),
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
    ]
    out = (
        base.groupBy("__g")
        .agg(F.min("__id").alias("canonical_id"), *aggs)
        .filter(F.col("n_members") >= int(min_members))
    )
    for c in mode_cols:
        cells = (
            base.groupBy("__g", c)
            .agg(F.count(F.when(F.col(c).isNotNull(), 1)).cast("long").alias("__n"))
            .filter(F.col("__n") > 0)
        )
        m = cells.groupBy("__g").agg(
            F.min(F.struct((-F.col("__n")).alias("__neg"), F.col(c).alias("__v")))
            .getField("__v")
            .alias(f"mode_{c}")
        )
        out = out.join(m, "__g", "left")
    out = out.drop("__g")
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out
