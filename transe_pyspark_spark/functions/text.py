"""Text-analysis scalar functions (SURVEY §2B R19 + north-star text ops).

Generalizes the reference's only text operation — tab-split tokenize
(``utils.py:6``) — into the column-level text toolkit a training-data
pipeline needs: tokenization, token counting, quality scoring,
language-ID, fingerprinting. Everything here is a Catalyst expression
(JVM-side, codegen'd); no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny English stopword list for quality scoring; deliberately short so
#: the oracle SQL can inline it.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single
#: non-alphanumeric-non-space marks. ASCII classes only so Java regex
#: (Spark) and RE2 (DuckDB) agree.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def words(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (robust to leading/trailing
    spaces — unlike a bare split)."""
    return F.filter(F.split(F.trim(text), " +"), lambda w: w != "")


def word_count(text: Column | str) -> Column:
    return F.size(words(text)).cast("long")


def token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letters/digits/punct marks)."""
    return F.regexp_count(F.col(text) if isinstance(text, str) else text, F.lit(TOKEN_PATTERN)).cast("long")


def avg_word_len(text: Column | str) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double"))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(total / F.size(ws))


def stopword_ratio(text: Column | str) -> Column:
    ws = words(F.lower(F.col(text) if isinstance(text, str) else text))
    stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(stop.cast("double") / F.size(ws).cast("double"))


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: length band + word-length band +
    stopword presence. Mirrors common pretraining-corpus filters
    (C4-style); weights are arbitrary but fixed and documented."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 5000), 0.4).otherwise(0.0)
    awl = avg_word_len(c)
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 0.3).otherwise(0.0)
    sw = stopword_ratio(c)
    sw_ok = F.when((sw > 0.0) & (sw < 0.6), 0.3).otherwise(0.0)
    return (len_ok + awl_ok + sw_ok).cast("double")


#: Characteristic high-frequency words per language for the n-gram/word
#: heuristic language ID. Deterministic, dependency-free.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": (),  # CJK detected by script, not word list
}


def lang_scores(text: Column | str) -> Column:
    """Map<lang, score>: fraction of words matching each language's
    marker list; 'zh' scored by CJK codepoint presence."""
    ws = words(F.lower(F.col(text) if isinstance(text, str) else text))
    n = F.size(ws)
    entries = []
    for lang, markers in _LANG_MARKERS.items():
        if markers:
            hits = F.size(F.filter(ws, lambda w: w.isin(*markers)))
            score = F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))
        else:
            c = F.col(text) if isinstance(text, str) else text
            score = F.when(c.rlike("[\\x{4e00}-\\x{9fff}]"), F.lit(1.0)).otherwise(F.lit(0.0))
        entries.extend([F.lit(lang), score])
    return F.create_map(*entries)


def lang_id(text: Column | str) -> Column:
    """argmax over ``lang_scores`` with deterministic tie-break on the
    language code; 'und' when every score is 0."""
    m = lang_scores(text)
    arr = F.map_entries(m)  # array<struct<key,value>>
    best = F.array_max(F.transform(arr, lambda e: F.struct(e["value"].alias("v"), e["key"].alias("k"))))
    return F.when(best["v"] <= 0.0, F.lit("und")).otherwise(best["k"])


def tfidf_features(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_features: int = 1 << 12,
    min_doc_freq: int = 1,
):
    """TF-IDF document vectors via the MLlib pipeline (SURVEY §2B R19:
    Tokenizer → HashingTF → IDF), returned as
    ``[id, tfidf: array<double>]``.

    Scale posture: HashingTF is stateless (no vocabulary shuffle — the
    feature index is a hash); only IDF's document-frequency aggregation
    shuffles, once. For an exact vocabulary use CountVectorizer, which
    pays a distinct-terms aggregation instead.
    """
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    tf = HashingTF(inputCol="__words", outputCol="__tf", numFeatures=num_features)
    words_df = tf.transform(tok.transform(df.select(id_col, text_col)))
    idf = IDF(inputCol="__tf", outputCol="__tfidf", minDocFreq=min_doc_freq).fit(words_df)
    return idf.transform(words_df).select(
        id_col, vector_to_array("__tfidf").alias("tfidf")
    )


def count_vectorize(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1 << 12,
    min_df: float = 1.0,
):
    """Exact-vocabulary term counts via CountVectorizer; returns
    ``([id, counts], vocabulary)`` — the R19 alternative to HashingTF
    when feature indices must be reversible to terms."""
    from pyspark.ml.feature import CountVectorizer, Tokenizer
    from pyspark.ml.functions import vector_to_array

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    words_df = tok.transform(df.select(id_col, text_col))
    cv = CountVectorizer(
        inputCol="__words", outputCol="__counts", vocabSize=vocab_size, minDF=min_df
    ).fit(words_df)
    out = cv.transform(words_df).select(id_col, vector_to_array("__counts").alias("counts"))
    return out, list(cv.vocabulary)


def fingerprint(text: Column | str) -> Column:
    """Deterministic polynomial rolling hash over characters:
    h = Σ ascii(cᵢ)·31^(n−1−i) mod (2^31−1), computed left-to-right as
    h ← (h·31 + ascii(c)) mod p. Pure integer arithmetic so any engine
    reproduces it exactly (the oracle uses ``list_reduce``)."""
    p = F.lit(2147483647).cast("long")
    chars = F.split(F.col(text) if isinstance(text, str) else text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % p,
    )


#: PII patterns, deliberately ASCII-simple so Java regex (Spark) and
#: RE2 (DuckDB) agree byte-for-byte on every match boundary.
EMAIL_PATTERN = "[a-z0-9]+@[a-z]+\\.[a-z]+"
PHONE_PATTERN = "555-[0-9]{4}"


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(email_count, phone_count) — per-document PII hit counts, the
    audit half of a scrub pass (a corpus release gate wants the counts
    logged even when the text is redacted)."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.regexp_count(c, F.lit(EMAIL_PATTERN)).cast("long"),
        F.regexp_count(c, F.lit(PHONE_PATTERN)).cast("long"),
    )


def scrub_pii(text: Column | str) -> Column:
    """Replace every email/phone match with a typed placeholder token
    (``<EMAIL>``/``<PHONE>``) — the standard pretraining-corpus PII
    scrub (global replace; the oracle needs RE2's ``'g'`` flag to
    match Java's replace-all default)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>"), PHONE_PATTERN, "<PHONE>"
    )


def dup_word_ratio(text: Column | str) -> Column:
    """1 − |distinct words|/|words| — the repetition signal from the
    Gopher quality rules (Rae et al. 2021 §A1.1 use repeated line/
    n-gram fractions; word-level is the analogue for single-line
    docs). 0.0 for empty docs."""
    ws = words(text)
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(ws)).cast("double") / F.size(ws).cast("double")
    )


def word_ngrams(text: Column | str, n: int, lowercase: bool = True) -> Column:
    """All word n-grams of a document as space-joined strings — the
    unit of benchmark decontamination (an n-gram shared with an eval
    set flags the document). Narrow expression: tokenize, explode the
    n-gram starts with ``sequence``, slice — no UDF, pipelines with
    the scan. Documents shorter than ``n`` words yield an empty array."""
    src = F.col(text) if isinstance(text, str) else text
    ws = words(F.lower(src) if lowercase else src)
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda s: F.array_join(F.slice(ws, s + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contaminated_docs(
    corpus,
    eval_docs,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Benchmark decontamination core: corpus documents sharing any
    word ``n``-gram with the eval set, with the shared-gram count.
    The eval side's distinct n-grams BROADCAST (eval sets are orders of
    magnitude smaller than a training corpus), so the corpus n-gram
    stream is probed map-side and never shuffles by gram; the only
    Exchange is the per-doc count aggregation. Returns
    ``(id_col, n_shared)``. Single definition shared by the
    ``benchmark_decontaminate`` query and the example pipeline."""
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__g")
    )
    eval_grams = eval_docs.select(
        F.explode(word_ngrams(text_col, n)).alias("__g")
    ).distinct()
    return (
        corpus_grams.join(F.broadcast(eval_grams), "__g")
        .groupBy(id_col)
        .agg(F.count_distinct("__g").cast("long").alias("n_shared"))
    )


def chunk_docs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
):
    """Fixed-size token-window chunking with overlap (size−stride
    tokens shared between consecutive chunks) — the map from documents
    to training sequences every LLM data pipeline runs last.

    Pure narrow ops: tokenize (JVM split), explode the chunk starts
    (``sequence(0, n−1, stride)``), slice the token array per start —
    no shuffle at all; at 100 TB this pipelines with the parquet scan.
    Output: (id, chunk_id, n_tokens, chunk_text); empty docs yield no
    chunks. Deterministic, so DuckDB reproduces it exactly via
    ``generate_series`` + ``list_slice``."""
    assert 0 < stride <= size
    ws = words(F.col(text_col))
    return (
        df.select(F.col(id_col), ws.alias("__ws"))
        .filter(F.size("__ws") > 0)
        .select(
            id_col,
            "__ws",
            F.explode(
                F.sequence(F.lit(0), F.size("__ws") - 1, F.lit(stride))
            ).alias("__start"),
        )
        .select(
            id_col,
            (F.col("__start") / stride).cast("long").alias("chunk_id"),
            F.slice("__ws", F.col("__start") + 1, size).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def gopher_keep(text: Column | str) -> Column:
    """The combined Gopher-rule keep verdict (word-count band 10..1000,
    mean word length 2..10, stopword fraction ≥ 0.05, duplicate-word
    fraction ≤ 0.6) — shared by the batch quality query and the
    streaming corpus-clean pipeline so both gates are one expression."""
    c = F.col(text) if isinstance(text, str) else text
    nw = F.size(words(c)).cast("long")
    return (
        nw.between(10, 1000)
        & avg_word_len(c).between(2.0, 10.0)
        & (stopword_ratio(c) >= 0.05)
        & (dup_word_ratio(c) <= 0.6)
    )


def bigram_familiarity(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Count-based language-model familiarity score per document: the
    mean corpus frequency of the document's word bigrams — the exact-
    arithmetic analogue of LM-perplexity quality scoring (documents
    whose n-grams the corpus has never seen score low: gibberish,
    boilerplate mutations, OCR noise; documents of common constructions
    score high). All integers until the final division, so the score is
    engine-reproducible (sum and count are exact; the one double
    division of two BIGINTs yields identical IEEE results everywhere).

    Plan: one narrow n-gram explode, one hash-agg building the corpus
    bigram table (the "LM"), one equi-join of the gram stream back
    against it, one per-doc aggregation — every shuffle keyed on gram
    or doc id, nothing quadratic, no UDF. At 100 TB the bigram table is
    itself corpus-sized; it hash-partitions by gram and the join
    co-partitions with the aggregate that built it (exchange reuse), so
    the scoring pass costs ~2 gram-keyed shuffles. Docs with < 2 words
    have no bigrams and are dropped (no LM evidence either way).
    """
    from pyspark.sql import functions as F

    grams = docs.select(F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("g"))
    lm = grams.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    return (
        grams.join(lm, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("freq").cast("bigint").alias("sum_freq"),
        )
        .select(
            id_col, "n_bigrams", "sum_freq",
            F.round(F.col("sum_freq").cast("double") / F.col("n_bigrams").cast("double"), 6).alias("familiarity"),
        )
    )


def cross_doc_ngram_dup(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
):
    """Cross-document repeated n-gram audit — the declarative signal
    behind exact-substring deduplication (a word n-gram occurring in
    more than one document marks boilerplate, templates, and copied
    spans; documents dominated by such grams are the ones substring
    dedup would trim). Complements ``repetition_ngrams`` (WITHIN-doc
    repetition) and ``bigram_familiarity`` (corpus frequency): this is
    the BETWEEN-doc duplication measure.

    Per document: ``n_grams`` (n-gram positions), ``n_dup_grams``
    (positions whose gram occurs in >1 DISTINCT document), and their
    ratio ``dup_fraction`` — exact integers until one final division.
    Documents shorter than ``n`` words drop (no spans to audit).

    Plan: narrow positioned-gram explode → gram-keyed
    ``count_distinct(doc)`` hash-agg (the corpus document-frequency
    table) → gram-keyed join back → per-doc agg. Every shuffle keys on
    gram or doc id; the DF table co-partitions with the aggregate that
    built it. Nothing quadratic, no UDF — the same shape that holds
    ``bigram_familiarity`` to ~2 gram-keyed shuffles at 100 TB."""
    from pyspark.sql import functions as F

    grams = docs.select(F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("g"))
    df_tab = grams.groupBy("g").agg(F.count_distinct(id_col).alias("df"))
    return (
        grams.join(df_tab, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_grams"),
        )
        .select(
            id_col, "n_grams", "n_dup_grams",
            F.round(
                F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("dup_fraction"),
        )
    )


def doc_keywords(
    docs,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager_cleanup: bool = True,
):
    """Per-document keyword extraction by TF-IDF-style lift — the
    corpus-indexing op behind search snippets, topic labels, and
    duplicate-cluster naming. Scores each (doc, term) by
    ``tf · (N + 1) / (df + 1)``: term frequency amplified by rarity
    across the corpus. This is the multiplicative-idf variant of
    TF-IDF chosen for EXACT cross-engine arithmetic — ``tf·(N+1)`` is
    a BIGINT product and the single IEEE division by ``(df+1)`` is
    correctly rounded on every engine, whereas ``ln(N/df)`` depends on
    each engine's libm (the orderings agree whenever idf is monotone
    decreasing in df, which both are).

    Plan: lowercase-word explode → (doc, term) hash-agg (tf) → a
    term-keyed document-frequency aggregate over the tf table (already
    distinct per doc — no second distinct) → score join on the term
    key → per-doc top-k window (WindowGroupLimit pushes a partial
    top-k below the shuffle, O(k) per doc). The corpus size N rides
    along as a broadcast single-row aggregate, in-plan. At 100 TB the
    df table is vocabulary-sized: broadcast when it fits, else the
    term-keyed join co-partitions with the aggregate that built it
    (the default here — no broadcast hint — lets AQE choose).

    Ties (same score) break on the term string, so the top-k set is
    total-ordered and oracle-checkable. Returns
    (id, term, tf, df, lift, rank) — ``rank`` 1-based.
    """
    tf = (
        docs.select(F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        # cache pin (r13): tf feeds TWO consumers — the df aggregate
        # and the score join — and unpinned, the corpus
        # tokenize+explode+agg executed TWICE per action (the
        # transition_counts r08 bug class; measured 2× the corpus pass
        # at sf1). RELEASED before return under the family's
        # eager-cleanup contract (ADVICE r13: a standing persist leaks
        # one cache entry per distinct input frame for the session).
        .persist()
    )
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("lift").desc(), F.col("term").asc())
    out = (
        tf.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "lift",
            (F.col("tf") * (F.col("__n") + 1)).cast("double") / (F.col("df") + 1).cast("double"),
        )
        .withColumn("kw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("kw_rank") <= k)
        .select(id_col, "term", "tf", "df", F.round("lift", 6).alias("lift"), "kw_rank")
    )
    if not eager_cleanup:
        # lazy mode (plan gate): leaves the tf pin in the cache manager
        return out
    out = out.localCheckpoint(eager=True)  # top-k-sized leaf — THEN release
    tf.unpersist()
    return out


def oov_rates(
    docs: "DataFrame",
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` word vocabulary — the tokenizer-coverage screen
    run before fixing a vocab (docs with high OOV under the candidate
    vocab are the ones a tokenizer will shred into bytes). Tokens are
    lowercased ``words()`` (the ``token_frequencies`` tokenization);
    the vocabulary is the ``vocab_size`` most frequent tokens with the
    deterministic (freq desc, token asc) tie order.

    Plan: one token hash-agg over the exploded stream builds the
    frequency table; the top-k cut is a sort-limit (per-task heaps);
    the ≤vocab_size vocabulary broadcasts back as a LEFT join flag over
    the token stream (map-side probe — the stream never shuffles by
    token again); per-doc rates are one doc-key hash-agg. The
    vocabulary build's exchange map stage is shared with nothing
    expensive above it, so the two passes over the token stream cost
    two narrow scans, not two shuffles.

    Returns (doc_id, n_tokens, n_oov, oov_rate); documents with zero
    tokens are absent (no rate to report).
    """
    toks = docs.select(
        F.col(id_col), F.explode(words(F.lower(F.col(text_col)))).alias("__w")
    )
    vocab = (
        toks.groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .orderBy(F.col("__freq").desc(), F.col("__w"))
        .limit(int(vocab_size))
        .select("__w", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias("oov_rate"),
        )
    )


def bm25_scores(
    docs,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    eager_cleanup: bool = True,
):
    """Okapi BM25 relevance of every document against a fixed query
    term set (Robertson & Zaragoza 2009, the Lucene ``ln(1 + (N - df
    + 0.5)/(df + 0.5))`` idf variant, which is always positive) —
    the retrieval-quality sibling of ``tfidf_features``, and unlike
    the MLlib pipeline fully SQL-expressible, so the registered face
    carries a value-hash oracle.

    Plan: ONE corpus pass tokenizes (JVM regex split on
    ``[^a-z0-9]+``, empties dropped — the oracle replays the exact
    regex) and is pinned (repartition-on-id + cache) because three
    consumers need it — the (N, avgdl) corpus aggregate, the per-term
    document frequencies, and the per-(doc, term) tf rows; un-pinned,
    each would re-run the scan+split (the repo's standing
    multi-consumer trap). df_t and (N, avgdl) are aggregate-sized and
    broadcast back, so scoring is narrow over the pinned frame: no
    corpus shuffle after the pin.

    Determinism contract: tf, dl, N, df are exact BIGINTs; the score
    mixes ONE non-correctly-rounded transcendental (ln) whose ≤1-ulp
    cross-engine drift is O(1e-15) absolute — rounding to 4 decimals
    makes the hash safe by ~11 orders of magnitude (the repo's
    exact-ints-plus-one-IEEE-op idiom, relaxed for the log).

    Returns (doc_id, n_matched_terms, score) for docs matching ≥1
    term, score = round(BM25, 4). With the default
    ``eager_cleanup=True`` the (doc-count-sized) result is
    materialized via ``localCheckpoint`` and the corpus-sized
    tokenization pin is RELEASED before returning — repeated calls
    don't accumulate pinned caches (r10 advisory; the
    ``degree_assortativity`` idiom). ``eager_cleanup=False`` keeps
    the lazy plan for the structural gate.
    """
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = (
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
            ).alias("__toks"),
        )
        .withColumn("__dl", F.size("__toks").cast("long"))
        .repartition(n_part, id_col)
        .cache()
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        toks.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(list(terms)))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    # two consumers (the df aggregate + the score join): pinned so the
    # explode+filter+agg over the cached tokens runs once (r14 guard
    # class); (doc × matched-term)-sized after the term filter.
    # persist() keeps the gate-visible lineage; released with toks in
    # the eager-cleanup branch.
    tf = tf.persist()
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    idf = dft.crossJoin(stats).select(
        "__t",
        F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        ).alias("__idf"),
        "__avgdl",
    )
    contrib = tf.join(F.broadcast(idf), "__t").select(
        id_col,
        (
            F.col("__idf")
            # (k1 + 1) as an ENGINE-SIDE IEEE add of the two literals,
            # not a Python-folded constant: the oracle writes
            # `(1.2 + 1.0)` so both engines round the same exact sum
            * (F.col("__tf").cast("double") * (F.lit(k1) + F.lit(1.0)))
            / (
                F.col("__tf").cast("double")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl"))
            )
        ).alias("__c"),
    )
    out = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        F.round(F.sum("__c"), 4).alias("score"),
    )
    if not eager_cleanup:
        # lazy mode (plan gate): leaves the tokenization pin in the
        # cache manager — library callers use the default
        return out
    out = out.localCheckpoint(eager=True)  # scored leaf — THEN release the pins
    toks.unpersist()
    tf.unpersist()
    return out


def source_divergence(
    docs,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    eager_cleanup: bool = True,
):
    """Per-source unigram distribution diagnostics: Shannon entropy of
    each source's token distribution and its KL divergence from the
    whole-corpus distribution — the domain-mixture skew report a
    pretraining pipeline reads before setting mixture weights (a
    source with high KL is lexically unlike the rest of the corpus;
    entropy collapse flags template/boilerplate sources).

    Plan: ONE tokenization pass (the ``bm25_scores`` regex) feeds the
    (source, token) count aggregate — the only corpus-sized shuffle —
    which is pinned (repartition-on-token + cache) because three
    consumers need it: corpus per-token counts, per-source totals, and
    the scoring join. Everything downstream is aggregate-sized
    (|sources|·|vocab| rows); the per-source totals and the 1-row
    corpus total broadcast back.

    Determinism contract (the ``bm25_scores`` idiom, hardened for
    big sums): counts are exact BIGINTs and every p/q division is a
    same-shape IEEE op, but a SUM of thousands of ``p·ln(p/q)``
    doubles is summation-order-dependent — so each per-term
    contribution is QUANTIZED to integer nano-units
    (``round(c·1e9) AS BIGINT``) and summed exactly; the quantized
    sum is order-free, replayed term-for-term by the SQL oracle, and
    11 orders below the round-4 output.

    Returns (source, n_tokens, n_distinct_tokens, entropy,
    kl_vs_corpus) — entropy/KL in nats, rounded to 4 decimals. With
    the default ``eager_cleanup=True`` the |sources|-sized result is
    materialized via ``localCheckpoint`` and the corpus-sized
    (source, token) pin is RELEASED before returning (r10 advisory;
    the ``degree_assortativity`` idiom); ``eager_cleanup=False``
    keeps the lazy plan for the structural gate.
    """
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    st = (
        docs.select(
            F.col(source_col).alias("__src"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
                )
            ).alias("__t"),
        )
        .groupBy("__src", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .repartition(n_part, "__t")
        .cache()
    )
    per_token = st.groupBy("__t").agg(F.sum("__c").cast("long").alias("__ct"))
    per_source = st.groupBy("__src").agg(
        F.sum("__c").cast("long").alias("__ns"),
        F.count(F.lit(1)).cast("long").alias("__nd"),
    )
    total = st.agg(F.sum("__c").cast("long").alias("__n"))
    p = F.col("__c").cast("double") / F.col("__ns").cast("double")
    q = F.col("__ct").cast("double") / F.col("__n").cast("double")
    scored = (
        st.join(per_token, "__t")
        .join(F.broadcast(per_source), "__src")
        .crossJoin(F.broadcast(total))
        .select(
            "__src",
            "__ns",
            "__nd",
            F.round((p * F.log(p / q)) * F.lit(1e9)).cast("long").alias("__kl_nano"),
            F.round((p * F.log(p)) * F.lit(1e9)).cast("long").alias("__plogp_nano"),
        )
    )
    out = scored.groupBy("__src", "__ns", "__nd").agg(
        F.round(-F.sum("__plogp_nano").cast("double") / F.lit(1e9), 4).alias("entropy"),
        F.round(F.sum("__kl_nano").cast("double") / F.lit(1e9), 4).alias("kl_vs_corpus"),
    ).select(
        F.col("__src").alias("source"),
        F.col("__ns").alias("n_tokens"),
        F.col("__nd").alias("n_distinct_tokens"),
        "entropy",
        "kl_vs_corpus",
    )
    if not eager_cleanup:
        # lazy mode (plan gate): leaves the (source, token) pin in
        # the cache manager — library callers use the default
        return out
    out = out.localCheckpoint(eager=True)  # |sources|-row leaf — THEN release
    st.unpersist()
    return out


def unigram_nll(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager_cleanup: bool = True,
):
    """Per-document mean negative log-likelihood under the corpus's own
    unigram distribution — the perplexity-style quality filter of
    pretraining pipelines (docs whose tokens the corpus finds SURPRISING
    score high: OCR noise, wrong-language fragments, hash dumps; docs of
    pure boilerplate score low). The corpus is its own language model,
    so no external LM assets are needed — the in-engine stand-in for
    the KenLM/CCNet perplexity screen.

    Plan: ONE tokenization pass (the ``source_divergence`` regex) feeds
    the (doc, token) count aggregate — corpus-sized, pinned
    (repartition-on-token + cache) for its two token-keyed consumers:
    the vocab-sized corpus counts and the scoring join (both ride the
    pin's partitioning, no re-shuffle). The 1-row total broadcasts
    back; the only other corpus-sized exchange is the final per-doc
    aggregate, which is the result's own key.

    Determinism contract (the ``source_divergence`` idiom): counts are
    exact BIGINTs; each per-term ``tf·ln(q)`` contribution is quantized
    to integer nano-units and summed exactly, so the sum is
    order-free and the SQL oracle replays it term-for-term; ONE final
    division by the doc's token count, rounded to 4 decimals.

    Returns (doc_id, n_tokens, mean_nll) — nats/token. Default
    ``eager_cleanup=True`` materializes via ``localCheckpoint`` and
    releases the corpus-sized pin before returning;
    ``eager_cleanup=False`` keeps the lazy plan for the structural
    gate."""
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    dt = (
        docs.select(
            F.col(id_col).alias("__d"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
                )
            ).alias("__t"),
        )
        .groupBy("__d", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
        .repartition(n_part, "__t")
        .cache()
    )
    # two consumers (the corpus total + the score join): pinned so the
    # vocab agg over the cached doc-term counts runs once (r14 guard
    # class); vocab-sized. persist() keeps the gate-visible lineage;
    # released with dt in the eager-cleanup branch.
    pt = dt.groupBy("__t").agg(F.sum("__tf").cast("long").alias("__ct")).persist()
    total = pt.agg(F.sum("__ct").cast("long").alias("__n"))
    q = F.col("__ct").cast("double") / F.col("__n").cast("double")
    scored = (
        dt.join(pt, "__t")
        .crossJoin(F.broadcast(total))
        .select(
            "__d",
            "__tf",
            F.round(F.col("__tf").cast("double") * F.log(q) * F.lit(1e9))
            .cast("long")
            .alias("__nll_nano"),
        )
    )
    out = (
        scored.groupBy("__d")
        .agg(
            F.sum("__tf").cast("long").alias("n_tokens"),
            F.round(
                -F.sum("__nll_nano").cast("double")
                / F.lit(1e9)
                / F.sum("__tf").cast("double"),
                4,
            ).alias("mean_nll"),
        )
        .select(F.col("__d").alias(id_col), "n_tokens", "mean_nll")
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # |docs|-row leaf — THEN release
    dt.unpersist()
    pt.unpersist()
    return out


def bm25_topk(
    docs,
    queries: dict[str, list[str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    eager_cleanup: bool = True,
):
    """Multi-query BM25 TOP-K RETRIEVAL — the search-engine face of
    ``bm25_scores``: score every document against a BATCH of queries in
    one corpus pass and keep each query's k best. This is the offline
    retrieval shape (query batch × corpus → ranked lists) behind both
    eval-set retrieval and hard-negative mining.

    Plan: the ``bm25_scores`` pinned-tokenization skeleton, shared
    across ALL queries — per-(doc, term) BM25 contributions are
    query-independent, so the corpus is tokenized and scored ONCE for
    the union of query terms; the tiny (query, term) map broadcasts
    onto the contributions and one hash aggregate per (query, doc)
    sums them. The final per-query top-k is a rank window ordered by
    the ROUNDED score with doc-id tiebreak: ordering on the 4-decimal
    contract (not the raw double) keeps ranks identical across
    engines, and Spark's WindowGroupLimit keeps per-partition state at
    O(k) before the shuffle — ≤ k·n_partitions rows exchange per
    query, never a query's full candidate list.

    Returns (query_id, rank, doc_id, n_matched_terms, score), rank
    1..k. Same eager-cleanup contract as ``bm25_scores``."""
    from pyspark.sql import Window

    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    all_terms = sorted({t for ts in queries.values() for t in ts})
    toks = (
        docs.select(
            F.col(id_col),
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
            ).alias("__toks"),
        )
        .withColumn("__dl", F.size("__toks").cast("long"))
        .repartition(n_part, id_col)
        .cache()
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        toks.select(id_col, "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(all_terms))
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    # two consumers (the df aggregate + the score join): pinned so the
    # explode+filter+agg over the cached tokens runs once (r14 guard
    # class); (doc × matched-term)-sized after the term filter.
    # persist() keeps the gate-visible lineage; released with toks in
    # the eager-cleanup branch.
    tf = tf.persist()
    dft = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    idf = dft.crossJoin(stats).select(
        "__t",
        F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        ).alias("__idf"),
        "__avgdl",
    )
    contrib = tf.join(F.broadcast(idf), "__t").select(
        id_col,
        "__t",
        (
            F.col("__idf")
            * (F.col("__tf").cast("double") * (F.lit(k1) + F.lit(1.0)))
            / (
                F.col("__tf").cast("double")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl"))
            )
        ).alias("__c"),
    )
    qt = docs.sparkSession.createDataFrame(
        [(q, t) for q, ts in sorted(queries.items()) for t in sorted(set(ts))],
        "query_id string, __t string",
    )
    scores = (
        contrib.join(F.broadcast(qt), "__t")
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
            F.round(F.sum("__c"), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col).asc())
    out = (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "n_matched_terms", "score")
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # ≤ |queries|·k leaf — THEN release
    toks.unpersist()
    tf.unpersist()
    return out


def top_terms_per_doc(
    docs,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager_cleanup: bool = True,
):
    """Per-document TOP-K TF-IDF terms — keyword extraction: the k
    terms that most distinguish each document from the corpus (doc
    tagging, index-term selection, near-dup triage by shared
    keywords). The reversible-vocabulary complement of
    ``tfidf_features``' hashed vectors: that face returns opaque
    hash-bucket weights for ML, this one returns the TERMS.

    Determinism contract — the ordering needs NO float at all: the
    per-term smooth idf ``ln((N+1)/(df+1)) + 1`` is quantized ONCE to
    integer nano-units per VOCAB term, and each (doc, term) score is
    then the exact BIGINT product ``tf · idf_nano`` — so the rank
    window orders on (BIGINT score, term) and any engine reproduces
    the ranks bit-for-bit (the idf is per-term, so quantizing before
    the tf multiply loses nothing the 4-dp contract would keep).

    Plan: ONE tokenization pass feeds the (doc, term) tf aggregate —
    corpus-sized, pinned (repartition-on-term + cache, the
    ``unigram_nll`` skeleton) for its two term-keyed consumers: the
    vocab-sized df aggregate (broadcast back with the idf already
    quantized) and the scoring join, both riding the pin's
    partitioning. The per-doc top-k is a rank window partitioned by
    doc — ``WindowGroupLimit`` keeps pre-shuffle state at O(k).
    Returns (doc_id, rank, term, tf, score_nano), rank 1..k. Same
    eager-cleanup contract as the family.
    """
    from pyspark.sql import Window

    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    tf = (
        docs.select(
            F.col(id_col).alias("__d"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
                )
            ).alias("__t"),
        )
        .groupBy("__d", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .repartition(n_part, "__t")
        .cache()
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("__n"))
    idf = F.broadcast(
        tf.groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__t",
            F.round(
                (
                    F.log(
                        (F.col("__n").cast("double") + 1.0)
                        / (F.col("__df").cast("double") + 1.0)
                    )
                    + 1.0
                )
                * 1e9,
                0,
            )
            .cast("long")
            .alias("__idf_nano"),
        )
    )
    w = Window.partitionBy("__d").orderBy(
        F.col("score_nano").desc(), F.col("__t").asc()
    )
    out = (
        tf.join(idf, "__t")
        .withColumn("score_nano", F.col("tf") * F.col("__idf_nano"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("__d").alias(id_col),
            "rank",
            F.col("__t").alias("term"),
            "tf",
            "score_nano",
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    tf.unpersist()
    return out


def collocations(
    docs,
    min_count: int = 5,
    text_col: str = "text",
    eager_cleanup: bool = True,
):
    """Adjacent-bigram collocation extraction ranked by pointwise
    mutual information — PHRASE MINING, the word2vec-phrases pass a
    tokenizer pipeline runs before vocabulary building ("new york" /
    "machine learning" detection): bigrams whose joint frequency beats
    what independent unigrams would predict.

    PMI per surviving bigram, in nats:
    ``ln((c12/N_pairs) / ((c1/N_uni)·(c2/N_uni)))
      = ln(c12·N_uni² / (N_pairs·c1·c2))`` — the ln argument is built
    from exact BIGINT counts with the same double expression shape on
    both engines and the result is quantized ONCE to integer
    nano-nats (the ``mutual_information`` determinism contract), so
    the face hash-checks. PMI may be negative (anti-collocations);
    half-away-from-zero rounding agrees on both engines.

    Plan: ONE tokenization pass pins the per-doc token arrays (the
    corpus-sized cache, released before return under the family's
    eager-cleanup contract) for its TWO consumers — the unigram
    explode and the adjacent-pair zip. Pairs build MAP-SIDE from the
    pinned arrays (``slice(1..n−1) ⨝ slice(2..n)`` zipped, then one
    explode): no position numbering, no self-join, no second
    tokenization. Support pruning (``c12 ≥ min_count``) happens on the
    pair aggregate BEFORE any join (the ``assoc_rules`` discipline);
    the pruned pair table then joins the vocab-sized unigram counts
    twice (broadcast) plus the two 1-row totals. The pair aggregate is
    |bigrams|-sized and eagerly checkpointed for its two consumers
    (the pre-prune total and the pruned scoring join).

    Returns (term_1, term_2, n_pair, pmi_nano), one row per bigram
    with ``n_pair ≥ min_count``.
    """
    toks = docs.select(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("__ts"),
    ).cache()
    uni = (
        toks.select(F.explode("__ts").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .localCheckpoint(eager=True)  # vocab-sized: totals + two joins
    )
    nu = F.broadcast(uni.agg(F.sum("__c").cast("long").alias("__nu")))
    ln_1 = F.greatest(F.size("__ts") - F.lit(1), F.lit(0))
    pc = (
        toks.select(
            F.slice("__ts", 1, ln_1).alias("__l"),
            F.slice("__ts", 2, ln_1).alias("__r"),
        )
        .select(F.explode(F.arrays_zip("__l", "__r")).alias("__p"))
        .groupBy(
            F.col("__p.__l").alias("__w1"), F.col("__p.__r").alias("__w2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c12"))
        .localCheckpoint(eager=True)  # |bigrams|-sized: total + pruned join
    )
    np_tot = F.broadcast(pc.agg(F.sum("__c12").cast("long").alias("__np")))
    u1 = F.broadcast(uni.select(F.col("__t").alias("__w1"), F.col("__c").alias("__c1")))
    u2 = F.broadcast(uni.select(F.col("__t").alias("__w2"), F.col("__c").alias("__c2")))
    pmi = F.log(
        (F.col("__c12").cast("double") * F.col("__nu") * F.col("__nu"))
        / (F.col("__np").cast("double") * F.col("__c1") * F.col("__c2"))
    )
    out = (
        pc.filter(F.col("__c12") >= int(min_count))
        .join(u1, "__w1")
        .join(u2, "__w2")
        .crossJoin(nu)
        .crossJoin(np_tot)
        .select(
            F.col("__w1").alias("term_1"),
            F.col("__w2").alias("term_2"),
            F.col("__c12").alias("n_pair"),
            F.round(pmi * 1e9, 0).cast("long").alias("pmi_nano"),
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    toks.unpersist()
    return out


def vocab_growth(
    docs,
    order_col: str = "source",
    text_col: str = "text",
):
    """Marginal-vocabulary growth across corpus SLICES in a stated
    acquisition order — the Heaps-law curve of the curation question
    "what does adding this slice actually buy": per slice, total
    tokens, distinct terms, terms FIRST SEEN in that slice (under the
    order), and the running vocabulary size. A slice whose n_new is
    near zero is lexical re-tread regardless of its token count — the
    data-buying signal token counts alone cannot give.

    Determinism: the order over slices is the natural ordering of
    ``order_col`` (dates, or lexicographic source names) — stated,
    total, engine-independent; every output is an exact BIGINT count.

    Plan: ONE tokenization pass feeds the (slice, term) count
    aggregate — the only corpus-sized shuffle — eagerly checkpointed
    for its two consumers: per-slice totals, and the per-term
    ``min(slice)`` first-seen aggregate whose regroup yields n_new.
    The running vocabulary is a window over the |slices|-row result —
    slice cardinality is BOUNDED BY CONTRACT (a source catalog or a
    calendar, never corpus-proportional), so the pid-less window here
    is aggregate-sized by construction, not a scale hazard.

    Returns (order_col, n_tokens, n_distinct, n_new, vocab_cum), one
    row per slice.
    """
    from pyspark.sql import Window

    cells = (
        docs.select(
            F.col(order_col).alias("__o"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
                )
            ).alias("__t"),
        )
        .groupBy("__o", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .localCheckpoint(eager=True)
    )
    per = cells.groupBy("__o").agg(
        F.sum("__n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    new = (
        cells.groupBy("__t")
        .agg(F.min("__o").alias("__o"))
        .groupBy("__o")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    w = Window.orderBy("__o").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.join(new, "__o", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("long"))
        .withColumn("vocab_cum", F.sum("n_new").over(w).cast("long"))
        .select(
            F.col("__o").alias(order_col),
            "n_tokens",
            "n_distinct",
            "n_new",
            "vocab_cum",
        )
    )
