"""Fuzzy record linkage / entity resolution (SURVEY §2B R6-adjacent).

The warehouse "are these the same real-world thing?" operator:
candidate pairs come from a cheap BLOCKING key (never an all-pairs
cross join), survive a length prefilter, and are scored with exact
edit distance — the classic block → prune → compare pipeline of
Fellegi-Sunter-style entity resolution, expressed as two narrow
projections and one equi-join so Catalyst owns the physical plan.

Reference parity: the reference has no linkage operator; this is part
of the beyond-reference training-data toolkit (dedup of near-identical
entity names across sources feeds the same downstream as document
near-dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str] | None = None,
    max_distance: int = 8,
    block_expr=None,
) -> DataFrame:
    """All id pairs (a < b) whose ``name_col`` values are within
    ``max_distance`` edits, restricted to pairs sharing a blocking key.

    Blocking is the scale lever: the equi-self-join on the block key
    bounds candidates to Σ_b |block_b|² instead of n² — the standard
    entity-resolution contract that a true match always shares the
    block (choose keys accordingly: phonetic code, first token, brand,
    zip). ``block_expr`` computes a derived key (e.g. the name's first
    word); ``block_cols`` uses existing columns; exactly one must be
    given.

    Pruning before the O(len²) distance kernel:

    * ``a < b`` on the id halves the candidate count;
    * the LENGTH filter ``|len(x) − len(y)| ≤ d`` is a provable lower
      bound on edit distance, evaluated from two cheap ints before the
      dynamic-programming kernel runs.

    Skewed blocks (one brand holding half the catalog) are ordinary
    join skew: AQE's skew-join split handles moderate cases, and the
    repo's ``salted_join`` pattern applies when one block explodes —
    or re-block with a finer key, the honest fix.

    Returns (id_a, id_b, name_a, name_b, distance), distance ≤
    ``max_distance``. Levenshtein is the classic unit-cost edit
    distance on both Spark and DuckDB — values are integers, so the
    result hash-checks exactly.
    """
    if (block_cols is None) == (block_expr is None):
        raise ValueError("give exactly one of block_cols / block_expr")
    key = block_expr.alias("__blk") if block_expr is not None else None
    base_cols = [F.col(id_col), F.col(name_col)]
    if key is not None:
        left = df.select(*base_cols, key)
        blocks = ["__blk"]
    else:
        left = df.select(*base_cols, *[F.col(c) for c in block_cols])
        blocks = list(block_cols)
    a = left.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.length(name_col).alias("__la"),
        *[F.col(c) for c in blocks],
    )
    b = left.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.length(name_col).alias("__lb"),
        *[F.col(c) for c in blocks],
    )
    d = int(max_distance)
    return (
        a.join(b, blocks)
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= d)
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("distance") <= d)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def _one_char_deletions(s):
    """Array of every string obtained by deleting exactly one character
    of ``s`` — pure built-ins (sequence → transform → substring
    concat), so the expansion stays inside whole-stage codegen."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )


def symmetric_delete_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """EXHAUSTIVE small-radius edit-distance self-join (SymSpell /
    FastSS symmetric-delete): every id pair (a < b) with
    ``levenshtein(name_a, name_b) ≤ max_distance`` — no blocking-key
    assumption, unlike ``blocked_levenshtein_pairs``, whose contract
    silently drops true matches that land in different blocks.

    Completeness proof sketch: fix an optimal alignment realizing
    ``ed(a, b) = e ≤ d``. For each substitution delete the aligned
    position from BOTH strings; for each character inserted into b
    delete it from b; for each character deleted from a delete it from
    a. Each side loses ≤ e ≤ d characters and the results are EQUAL —
    so the ≤d-deletion variant sets of any true pair intersect, and an
    equi-join on variants finds every candidate. Candidates are then
    verified with the exact DP kernel, so the result is exact; the
    deletion signatures only bound WHERE the join looks.

    Scale posture (the reason this beats the quadratic NOT-EXISTS
    definition the oracle states): each string emits
    O(len^d) deletion variants (len+1 at d=1) built by codegen'd array
    transforms — the join is posting-list-shaped on the variant
    string, exactly the inverted-index discipline of the dedup family
    (`dedup.py` prefix/PPJoin), never an all-pairs product. Variant
    posting lists are Zipf-bounded by construction (a variant is a
    near-unique string); a pathological hot variant (e.g. mass-
    duplicated names) is ordinary join skew — AQE skew split or the
    repo's ``salted_join``. The candidate set is deduplicated BEFORE
    the O(len²) verify kernel so each surviving pair pays Levenshtein
    once.

    ``max_distance`` ≤ 2 is enforced: the variant count is the scale
    dial and d ≥ 3 wants the PassJoin segment-signature family
    instead (documented trade, not a silent fallback).

    Output-volume caveat (measured): the cost scales with the TRUE
    pair count, which depends on how densely the name space fills its
    edit-distance neighborhoods. On the synthetic sequential
    ``Customer#NNNNNN`` fixture nearly every single-digit substitution
    exists, so pairs grow ~quadratically with names (15k names →
    262,500 pairs; 150k names → 26,925,000 pairs, ~203 s on 32
    threads) — a fixture artifact, not a plan property: the candidate
    join stays posting-list-shaped and the per-pair verify is O(1).
    Real name corpora occupy their neighborhoods sparsely.

    Returns (id_a, id_b, distance), distance ≤ ``max_distance``;
    BIGINT throughout so the result hash-checks exactly.
    """
    d = int(max_distance)
    if not 1 <= d <= 2:
        raise ValueError(
            f"symmetric_delete_pairs supports max_distance in [1, 2], got {d} "
            "(d >= 3 explodes the deletion neighborhood — use PassJoin segments)"
        )
    s = F.col(name_col)
    variants = F.array(s)
    frontier = F.array(s)
    for _ in range(d):
        frontier = F.array_distinct(F.flatten(F.transform(frontier, _one_char_deletions)))
        variants = F.array_union(variants, frontier)
    # IDS ONLY through the hot path: the candidate join and its
    # distinct move (sig, id) / (id_a, id_b) rows — never the name
    # strings (measured 2.4× at the 150k-name 10× point: carrying two
    # 18-char names through the ~20M-row candidate shuffle and its
    # distinct state dominated the old plan). Names re-attach onto the
    # DEDUPLICATED pair set via two id-keyed joins against the narrow
    # (id, name) projection — pair-set-sized probes, and the verify
    # kernel still runs exactly once per surviving pair.
    sig = df.select(
        F.col(id_col).alias("__id"),
        F.explode(variants).alias("__sig"),
    )
    cand = (
        sig.select(F.col("__id").alias("id_a"), "__sig")
        .join(sig.select(F.col("__id").alias("id_b"), "__sig"), "__sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    names = df.select(F.col(id_col).alias("__nid"), F.col(name_col).alias("__nm"))
    return (
        cand.join(names.select(F.col("__nid").alias("id_a"), F.col("__nm").alias("name_a")), "id_a")
        .join(names.select(F.col("__nid").alias("id_b"), F.col("__nm").alias("name_b")), "id_b")
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("distance") <= d)
        .select("id_a", "id_b", "distance")
    )
