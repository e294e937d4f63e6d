"""Property/invariant tests (SURVEY §5.2/§5.4): the stochastic and
non-SQL-expressible operators, checked by invariants and by equivalence
against their exact counterparts."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from transe_pyspark_spark.operators import dedup as D
from transe_pyspark_spark.operators import similarity as S
from transe_pyspark_spark.operators.relational import dict_encode
from transe_pyspark_spark.sources.readers import load_table


def test_dict_encode_dense_and_deterministic(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    v1 = dict_encode(part, "p_brand").collect()
    v2 = dict_encode(part, "p_brand").collect()
    assert v1 == v2
    ids = sorted(r.id for r in v1)
    assert ids == list(range(len(ids)))  # dense 0..V-1
    toks = [r.token for r in sorted(v1, key=lambda r: r.id)]
    assert toks == sorted(toks)  # id order == token order


def test_seeded_sample_reproducible_and_sized(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    s1 = orders.sample(False, 0.5, seed=7)
    s2 = orders.sample(False, 0.5, seed=7)
    c1 = s1.count()
    assert c1 == s2.count()
    assert sorted(r.o_orderkey for r in s1.collect()) == sorted(r.o_orderkey for r in s2.collect())
    assert abs(c1 / n - 0.5) < 0.1  # concentration


def test_knn_broadcast_matches_relational(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rel = S.knn_relational(q, emb, k=10).collect()
    bc = S.knn_broadcast(spark, q, emb, k=10).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.neighbor_id, r.rank) for r in rel]) == sorted(
        [(r.query_id, r.neighbor_id, r.rank) for r in bc]
    ), "broadcast/mapInPandas kNN must equal the relational plan"
    assert len({key(r) for r in rel}) == len(rel)


def test_ann_lsh_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_relational(q, emb, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in S.ann_lsh(q, emb, k=10, num_hash_tables=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"ANN recall too low: {recall}"


def test_ann_ivf_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_relational(q, emb, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in S.ann_ivf(q, emb, k=10, n_cells=16, n_probe=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_minhash_lsh_recall_vs_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(docs, threshold=0.8, shingle_n=3).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.8, shingle_n=3, num_hashes=64, bands=16).collect()
    }
    # verify=True re-checks exact jaccard on candidates → no false
    # positives; recall on well-above-threshold pairs should be high.
    assert lsh <= exact
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"MinHash-LSH recall {recall} on {len(exact)} true pairs"


def test_simhash_pairs_symmetric_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    pairs = D.simhash_pairs(docs, max_hamming=2, bits=32, shingle_n=3).collect()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 2


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.05


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    """R2 sink: partitioned write → read-back preserves rows and values
    (partition pruning path: reading one partition returns its subset)."""
    from transe_pyspark_spark.sources.readers import write_parquet

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_sink")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    a = orders.agg(F.sum((F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    b = back.agg(F.sum((F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    assert a == b
    one_status = orders.select("o_orderstatus").first()[0]
    pruned = spark.read.parquet(out).filter(F.col("o_orderstatus") == one_status)
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == one_status).count()


def test_tfidf_invariants(spark, sf_dir):
    """R19 MLlib TF-IDF: right shape, non-negative, and a ubiquitous
    word must carry (near-)zero idf weight."""
    from transe_pyspark_spark.functions.text import tfidf_features

    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = tfidf_features(docs, num_features=512).collect()
    assert len(out) == 200
    for r in out[:20]:
        assert len(r.tfidf) == 512
        assert all(v >= 0.0 for v in r.tfidf)
    nonzero = sum(1 for r in out if any(v > 0 for v in r.tfidf))
    assert nonzero == 200  # every doc has some term weight


def test_count_vectorizer_vocab(spark, sf_dir):
    from transe_pyspark_spark.functions.text import count_vectorize

    docs = load_table(spark, sf_dir, "documents").limit(100)
    out, vocab = count_vectorize(docs, vocab_size=256)
    rows = out.collect()
    assert len(rows) == 100 and len(vocab) <= 256 and len(vocab) > 0
    # counts are term frequencies: integer-valued, non-negative
    for r in rows[:10]:
        assert all(v >= 0 and float(v).is_integer() for v in r.counts)


def test_multimodal_feature_invariants(spark, sf_dir):
    from transe_pyspark_spark.operators import multimodal as MM

    d = MM.with_payload(load_table(spark, sf_dir, "documents").limit(100))
    rows = MM.extract_features(d).collect()
    assert len(rows) == 100
    for r in rows:
        assert len(r.byte_hist) == 16
        assert abs(sum(r.byte_hist) - 1.0) < 1e-9
        assert 0.0 <= r.entropy <= 4.0 + 1e-9  # log2(16) bound


def test_multimodal_resize_fixed_output(spark, sf_dir):
    from transe_pyspark_spark.operators import multimodal as MM

    d = MM.with_payload(load_table(spark, sf_dir, "documents").limit(50))
    rows = MM.resize_media(d, target_w=16, target_h=8).collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.resized) == 16 * 8  # bounded output regardless of input size
        assert (r.width, r.height) == (16, 8)


def test_multimodal_frame_sampling(spark, sf_dir):
    from transe_pyspark_spark.operators import multimodal as MM

    d = MM.with_payload(load_table(spark, sf_dir, "documents").limit(20))
    frames = MM.sample_frames(d, every=4, frame_size=8).collect()
    assert all(len(r.frame) <= 8 for r in frames)
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_no)
    for doc_id, nos in per_doc.items():
        assert sorted(nos) == list(range(len(nos)))  # dense frame numbering


def test_decode_image_real_or_documented_stub():
    """Optional-import decode contract: with Pillow present a real PNG
    decodes to its true dimensions; without it the call raises the
    documented NotImplementedError (never a bare ImportError)."""
    from transe_pyspark_spark.operators import multimodal as MM

    try:
        import io

        from PIL import Image
    except ImportError:
        import pytest

        with pytest.raises(NotImplementedError, match="fake_meta"):
            MM.decode_image_real(b"\x89PNG\r\n\x1a\n not a real image")
        return
    buf = io.BytesIO()
    Image.new("RGB", (7, 3)).save(buf, format="PNG")
    meta = MM.decode_image_real(buf.getvalue())
    assert (meta["width"], meta["height"], meta["channels"]) == (7, 3, 3)


def test_json_source_roundtrip(spark, tmp_path):
    """R1 JSON-lines scan with explicit schema."""
    import json as _json

    from pyspark.sql import types as T

    from transe_pyspark_spark.sources.readers import read_json

    p = tmp_path / "rows.jsonl"
    rows = [{"id": i, "name": f"n{i}", "score": i * 0.5} for i in range(50)]
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = read_json(spark, str(p), schema)
    got = sorted((r.id, r.name, r.score) for r in df.collect())
    assert got == [(r["id"], r["name"], r["score"]) for r in rows]


def test_salted_join_matches_plain(spark, sf_dir):
    from transe_pyspark_spark.operators.relational import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "k")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "k").select("k", "o_orderpriority")
    plain = li.join(o, "k").groupBy("o_orderpriority").count().collect()
    salted = salted_join(li, o, on="k", salt=8).groupBy("o_orderpriority").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Joining two tables bucketed on the join key must plan ZERO
    exchanges — the co-location argument for paying the shuffle once at
    write time (100 TB fact⨝fact joins)."""
    import contextlib
    import io

    from transe_pyspark_spark.sources.readers import write_bucketed

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bucketed", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        exchange_nodes = [
            line for line in plan.splitlines()
            if line.strip().startswith("(") and line.strip().endswith("Exchange")
        ]
        assert not exchange_nodes, f"bucketed join should not shuffle: {exchange_nodes}"
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_sql_interface_parity(spark, sf_dir):
    """spark.sql over registered fixture views must match the DataFrame
    plan — users can drive the engine purely through SQL."""
    from transe_pyspark_spark.plans.queries import REGISTRY
    from transe_pyspark_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    sql_rows = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """).collect()
    df_rows = (
        REGISTRY["pricing_summary"].fn(spark, sf_dir)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    )
    key = lambda r: (r.l_returnflag, r.l_linestatus)
    assert sorted(map(tuple, sql_rows), key=str) == sorted(map(tuple, df_rows), key=str)


def test_csv_sink_roundtrip(spark, tmp_path):
    """R2 CSV/TSV sink → R1 scan round-trip on triples-shaped data."""
    from transe_pyspark_spark.sources.readers import read_triples_tsv, write_csv

    df = spark.createDataFrame(
        [(f"e{i}", f"r{i % 3}", f"e{i + 1}") for i in range(100)], ["head", "label", "tail"]
    )
    out = str(tmp_path / "triples_out")
    write_csv(df, out)
    back = read_triples_tsv(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_near_dedup_canonical_invariants(spark, sf_dir):
    """Cluster-level dedup: every document gets a verdict; within each
    connected component exactly the min-id doc is kept."""
    docs = load_table(spark, sf_dir, "documents")
    verdicts = D.near_dedup_canonical(docs, threshold=0.6, shingle_n=3)
    rows = verdicts.collect()
    assert len(rows) == docs.count()
    pairs = D.minhash_lsh_pairs(docs, threshold=0.6, shingle_n=3)
    comps = {r.id: r.component for r in D.connected_components(pairs).collect()}
    kept = {r.doc_id for r in rows if r.keep}
    by_comp: dict[int, list[int]] = {}
    for doc, comp in comps.items():
        by_comp.setdefault(comp, []).append(doc)
    for comp, members in by_comp.items():
        assert sum(1 for m in members if m in kept) == 1
        assert min(members) in kept
    # docs outside any pair are all kept
    clustered = set(comps)
    for r in rows:
        if r.doc_id not in clustered:
            assert r.keep


def test_exact_dup_groups_partition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = D.exact_dup_groups(docs)
    assert groups.agg(F.sum("dup_count")).collect()[0][0] == docs.count()


def test_quadratic_ops_guarded(spark):
    """O(n²) ground-truth ops refuse unbounded inputs unless the caller
    passes allow_quadratic=True — the LSH/ANN scale path must be the
    only unflagged door."""
    from transe_pyspark_spark.operators._guards import QUADRATIC_ROW_LIMIT

    big_docs = spark.range(QUADRATIC_ROW_LIMIT + 1).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    with pytest.raises(ValueError, match="allow_quadratic"):
        D.jaccard_pairs(big_docs, threshold=0.6).count()
    big_vecs = spark.range(QUADRATIC_ROW_LIMIT + 1).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(0.0)).alias("embedding")
    )
    with pytest.raises(ValueError, match="allow_quadratic"):
        S.cosine_pairs(big_vecs, threshold=0.9).count()
    # the escape hatch still works (plan built lazily, no need to run it)
    D.jaccard_pairs(big_docs, threshold=0.6, allow_quadratic=True)
    S.cosine_pairs(big_vecs, threshold=0.9, allow_quadratic=True)


@pytest.mark.parametrize("shingle_n,threshold", [(1, 0.5), (3, 0.6)])
def test_jaccard_prefix_matches_exact(spark, sf_dir, shingle_n, threshold):
    """Prefix-filtered (AllPairs/PPJoin) exact Jaccard returns the
    IDENTICAL pair set (ids and rounded scores) as the ground-truth
    inverted-index path — the prefix filter may only prune pairs that
    cannot reach the threshold."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        tuple(r) for r in D.jaccard_pairs(docs, threshold=threshold, shingle_n=shingle_n).collect()
    }
    prefix = {
        tuple(r)
        for r in D.jaccard_prefix_pairs(docs, threshold=threshold, shingle_n=shingle_n).collect()
    }
    assert prefix == exact


@pytest.mark.parametrize("threshold", [0.2, 0.8])
def test_jaccard_prefix_float_boundary(spark, threshold):
    """Thresholds whose binary repr rounds ABOVE the rational value
    (0.2, 0.8) must not drop boundary pairs: t·n floats just above an
    exact integer, so an epsilon-free ceil over-shortens the prefix and
    the length filter rejects |B| == t·|A| exactly. Doc pairs below sit
    exactly AT J == t (|A∩B|=1,|A∪B|=5 → 0.2; |A∩B|=4,|A∪B|=5 → 0.8)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo"),
            (2, "alpha"),  # J(1,2) = 1/5 = 0.2, |B| = t·|A| exactly at t=0.2
            (3, "alpha bravo charlie delta"),  # J(1,3) = 4/5 = 0.8
            (4, "zulu yankee xray"),  # disjoint noise
        ],
        "doc_id long, text string",
    )
    exact = {tuple(r) for r in D.jaccard_pairs(docs, threshold=threshold).collect()}
    prefix = {tuple(r) for r in D.jaccard_prefix_pairs(docs, threshold=threshold).collect()}
    assert prefix == exact
    boundary = (1, 2, 0.2) if threshold == 0.2 else (1, 3, 0.8)
    assert boundary in prefix


def test_ann_ivf_pq_recall(spark, sf_dir):
    """IVF-PQ with exact shortlist re-rank must recover recall
    comparable to plain IVF at the same probe budget — quantization
    error may not cost ordering quality after refinement."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in S.knn_relational(q, emb, k=10).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_ivf_pq(q, emb, k=10, n_cells=16, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    # r04: refine_factor default 16 closes to within ~0.015 of the
    # probe-budget (cell-miss) bound — gate raised from 0.6
    assert recall >= 0.72, f"IVF-PQ recall too low: {recall}"


def test_chunk_docs_partitions_tokens(spark):
    """Chunking invariants: with stride == size the chunks tile the
    document exactly (concatenation in chunk_id order reconstructs the
    token stream); with overlap each chunk starts stride tokens after
    the previous and only the starts change. Empty docs yield no
    chunks."""
    from transe_pyspark_spark.functions.text import chunk_docs

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(11))), (2, "a b c"), (3, "   ")],
        "doc_id long, text string",
    )
    tiled = chunk_docs(docs, size=4, stride=4).collect()
    by_doc = {}
    for r in sorted(tiled, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # whitespace-only doc: no chunks
    rebuilt = " ".join(r.chunk_text for r in by_doc[1])
    assert rebuilt == " ".join(f"w{i}" for i in range(11))
    assert [r.n_tokens for r in by_doc[1]] == [4, 4, 3]
    assert [r.n_tokens for r in by_doc[2]] == [3]

    overlapped = sorted(
        chunk_docs(docs.filter("doc_id = 1"), size=4, stride=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0,2,4,6,8,10 → six chunks, consecutive ones share size-stride tokens
    assert len(overlapped) == 6
    for a, b in zip(overlapped, overlapped[1:]):
        assert a.chunk_text.split()[2:] == b.chunk_text.split()[: a.n_tokens - 2]


def test_stratified_mod_sample_exact_rates(spark):
    """The deterministic mixer keeps exactly the rows whose key mod
    denom clears the per-stratum threshold — verified row-by-row
    against a driver-side reproduction, including the default rate."""
    from transe_pyspark_spark.operators.relational import stratified_mod_sample

    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, lang string")
    got = {r.k for r in stratified_mod_sample(
        df, strata_col="lang", key_col="k",
        fractions={"en": 0.5, "zh": 0.2}, default=0.1,
    ).collect()}
    thresholds = {"en": 50, "zh": 20, "de": 10}
    want = {k for k, lang in rows if k % 100 < thresholds[lang]}
    assert got == want


def test_scrub_pii_idempotent_and_counted(spark):
    """Scrubbing is idempotent (placeholders never re-match) and the
    audit counts agree with the number of replacements made."""
    from transe_pyspark_spark.functions.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail me at bob99@site.org or ann@x.io, call 555-0199 x2")],
        "id long, text string",
    )
    emails, phones = pii_counts("text")
    once = df.select(
        emails.alias("e"), phones.alias("p"), scrub_pii("text").alias("s")
    ).first()
    assert (once.e, once.p) == (2, 1)
    assert once.s.count("<EMAIL>") == 2 and once.s.count("<PHONE>") == 1
    twice = spark.createDataFrame([(1, once.s)], "id long, text string").select(
        scrub_pii("text").alias("s")
    ).first()
    assert twice.s == once.s


def test_orc_sink_roundtrip(spark, sf_dir, tmp_path):
    """R1/R2 ORC: write → read-back preserves rows and values, and a
    pushed filter prunes correctly (same contract as the parquet
    sink)."""
    from transe_pyspark_spark.sources.readers import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(orders, out, partition_by=["o_orderstatus"])
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    a = orders.agg(F.sum((F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    b = back.agg(F.sum((F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    assert a == b
    one = orders.select("o_orderstatus").first()[0]
    assert (
        read_orc(spark, out).filter(F.col("o_orderstatus") == one).count()
        == orders.filter(F.col("o_orderstatus") == one).count()
    )


def test_join_strategy_invariance(spark, sf_dir):
    """Physical-plan robustness: disabling broadcast joins entirely
    (autoBroadcastJoinThreshold=-1 → Catalyst picks sort-merge/shuffled
    hash) must not change any query result. Results are plan-invariant;
    only the shuffle bill changes."""
    from transe_pyspark_spark.plans.queries import REGISTRY

    names = ["region_revenue", "top_revenue_orders", "customer_order_stats"]
    key = "spark.sql.autoBroadcastJoinThreshold"
    before = {n: sorted(map(tuple, REGISTRY[n].fn(spark, sf_dir).collect())) for n in names}
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        after = {n: sorted(map(tuple, REGISTRY[n].fn(spark, sf_dir).collect())) for n in names}
    finally:
        spark.conf.set(key, old)
    assert before == after


def test_pack_by_running_total_matches_python(spark):
    """Distributed prefix-sum packing == the sequential greedy fill:
    pack ids are a pure function of (order, weights, budget), monotone
    in order, and each pack's weight never exceeds budget + one item."""
    from transe_pyspark_spark.operators.relational import pack_by_running_total

    weights = [7, 1, 9, 3, 3, 8, 2, 5, 4, 6, 10, 1, 1, 12, 2]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "k long, w long"
    )
    got = {
        r.k: r.pack_id
        for r in pack_by_running_total(df, "k", "w", budget=10, num_partitions=4).collect()
    }
    acc, want = 0, {}
    for i, w in enumerate(weights):
        want[i] = acc // 10
        acc += w
    assert got == want
    per_pack: dict[int, int] = {}
    for i, w in enumerate(weights):
        per_pack[want[i]] = per_pack.get(want[i], 0) + w
    assert all(v <= 10 + max(weights) for v in per_pack.values())


def test_pack_exact_with_nondeterministic_input(spark, sf_dir):
    """r03 ADVICE regression: the range-partitioned frame must be
    evaluated ONCE (frozen by eager persist). An input plan carrying a
    nondeterministic expression (monotonically_increasing_id) defeats
    ReuseExchange, so a two-evaluation formulation silently misassigns
    offsets — measured 53k/60k wrong pack ids before the fix."""
    import numpy as np
    from transe_pyspark_spark.operators.relational import pack_by_running_total

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn("rid", F.monotonically_increasing_id())
        .select("rid", F.col("l_quantity").cast("long").alias("w"))
        .persist()
    )
    li.count()
    try:
        pdf = (
            pack_by_running_total(li, "rid", "w", budget=1000)
            .toPandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        excl = np.concatenate([[0], pdf["w"].to_numpy().cumsum()[:-1]])
        assert (pdf["pack_id"].to_numpy() == excl // 1000).all()
    finally:
        li.unpersist()


def test_gap_fill_rejects_unsupported_bucket(spark):
    """ADVICE regression: '30 minutes' would bucket by DAY while the
    grid steps by 30 minutes — must raise, not silently misalign."""
    import pytest

    from transe_pyspark_spark.operators.asof import gap_fill_resample

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="30 minutes"):
        gap_fill_resample(df, bucket="30 minutes")


def test_incremental_dedup_restart_and_idempotency(spark, sf_dir, tmp_path):
    """Incremental dedup state survives a 'restart' (every call reads
    state from disk — nothing lives in the session), admitted drops
    partition the distinct-fingerprint space, and relanding a drop
    admits ZERO rows (at-least-once shard delivery cannot double-admit
    content)."""
    from transe_pyspark_spark.functions.text import fingerprint
    from transe_pyspark_spark.operators.incremental import dedup_drop, seen_fingerprints
    from transe_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    state = str(tmp_path / "state")
    drop1 = docs.filter(F.col("doc_id") % 2 == 0)
    drop2 = docs.filter(F.col("doc_id") % 2 == 1)

    a1 = dedup_drop(spark, drop1, state)
    n1 = a1.count()
    assert n1 == drop1.select(fingerprint("text")).distinct().count()

    # restart: a fresh operator call against the same path sees drop1's
    # fingerprints (state is the parquet, not session memory)
    assert seen_fingerprints(spark, state).count() == n1

    a2 = dedup_drop(spark, drop2, state)
    n2 = a2.count()
    # admitted sets are disjoint by fp and together cover exactly the
    # distinct fingerprints of the union
    total = docs.select(fingerprint("text")).distinct().count()
    assert n1 + n2 == total
    assert a1.select("fp").intersect(a2.select("fp")).count() == 0

    # reland drop1: everything already admitted -> zero new rows,
    # state unchanged
    again = dedup_drop(spark, drop1, state)
    assert again.count() == 0
    assert seen_fingerprints(spark, state).count() == total


def test_aqe_skew_join_splits(spark):
    """Skew demonstration gate (VERDICT r03 item 5): on the hot-key
    join fixture the FINALIZED adaptive plan must carry skew=true (AQE
    split the oversized partition) while the AQE-off plan must not —
    executed-plan evidence, since the marker only exists after a run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "skew_demo",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "skew_demo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    _, _, plan_aqe = mod.run_variant(spark, "/root/testdata/sf0.01", "aqe", n_runs=1)
    assert "skew=true" in plan_aqe, "AQE did not split the skewed partition"
    _, _, plan_plain = mod.run_variant(spark, "/root/testdata/sf0.01", "plain", n_runs=1)
    assert "skew=true" not in plan_plain


def test_incremental_neardedup_rejects_exact_and_near(spark, tmp_path):
    """Cross-drop NEAR-dedup: drop 2 documents that are exact copies or
    light edits of drop 1 content must be rejected via the persisted
    signature state (drop 1's text is never re-read); novel documents
    are admitted. Relanding drop 1 admits nothing (exact copies agree
    on every minhash component)."""
    from transe_pyspark_spark.operators.incremental import neardedup_drop

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    other = "completely different words about spark shuffles and partitions at scale"
    drop1 = spark.createDataFrame(
        [(0, base), (1, other)], "doc_id long, text string"
    )
    state = str(tmp_path / "nd")
    a1 = neardedup_drop(spark, drop1, state)
    assert {r.doc_id for r in a1.collect()} == {0, 1}

    drop2 = spark.createDataFrame(
        [
            (10, base),                       # exact copy of doc 0 -> reject
            (11, base + " indeed"),           # near copy of doc 0 -> reject
            (12, "entirely new content on llm training corpora and quality filtering rules"),
        ],
        "doc_id long, text string",
    )
    a2 = neardedup_drop(spark, drop2, state)
    assert {r.doc_id for r in a2.collect()} == {12}

    # reland drop 1 -> nothing admitted
    again = neardedup_drop(spark, drop1, state)
    assert again.count() == 0

    # within-drop: two near-identical docs in ONE drop keep the min id
    drop3 = spark.createDataFrame(
        [(20, "fresh sentence about window functions and watermarks in streams ok"),
         (21, "fresh sentence about window functions and watermarks in streams ok fine")],
        "doc_id long, text string",
    )
    a3 = neardedup_drop(spark, drop3, state)
    assert {r.doc_id for r in a3.collect()} == {20}


def test_time_weighted_avg_edges(spark):
    """TWA edges: a single-observation key has no span and is omitted;
    a constant-valued key averages to exactly that value; a step
    change weights by duration (10 cents for 3us, 20 for 1us -> 12.5)."""
    import datetime as dt

    from transe_pyspark_spark.operators.asof import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    rows = [
        (1, t0, 0.10), (1, t0 + 3 * us, 0.20), (1, t0 + 4 * us, 0.99),
        (2, t0, 5.0),
        (3, t0, 0.07), (3, t0 + 10 * us, 0.07), (3, t0 + 20 * us, 0.07),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r.user_id: (r.twa_cents, r.span_us) for r in time_weighted_avg(df).collect()}
    assert 2 not in got
    assert got[1] == ((10 * 3 + 20 * 1) / 4.0, 4)
    assert got[3] == (7.0, 20)


def test_ivf_persisted_matches_inline_and_prunes(spark, sf_dir):
    """Build-once/probe-many IVF: the persisted index returns the SAME
    (query, neighbor, rank) set as the inline ann_ivf at the same seed
    (the index is a layout, not a different algorithm), and the probe
    scan prunes unprobed cell partitions."""
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    S.ivf_build(emb, idx, n_cells=16, seed=42)
    persisted = S.ivf_query(spark, q, idx, k=10, n_probe=6)
    inline = S.ann_ivf(q, emb, k=10, n_cells=16, n_probe=6, seed=42)
    a = {(r.query_id, r.neighbor_id, r.rank) for r in persisted.collect()}
    b = {(r.query_id, r.neighbor_id, r.rank) for r in inline.collect()}
    assert a == b and a
    # partition pruning: the postings scan must carry a filter on the
    # cell partition column (dynamic pruning from the probe join)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        persisted.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "dynamicpruning" in plan.lower(), plan[:2000]
