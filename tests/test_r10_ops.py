"""Round-10 regression tests: bench fails loudly on dead sections
(VERDICT r09 ask #7) and the semantic-dedup assignment pin
(VERDICT r09 ask #6)."""

from __future__ import annotations

import sys

import pytest


# ------------------------------------------------- bench incomplete trailer


def _bench_module():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_bench_exits_nonzero_on_sf1_section_error(capsys):
    """The r09 artifact memorialized `"sf1": {"error": ...}` and exited 0,
    so the aborted section went unnoticed for a whole round. A dead
    section must now print `# BENCH INCOMPLETE` and exit nonzero."""
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete({"error": "tuple.count() ..."}, {})
    assert exc.value.code == 1
    assert "# BENCH INCOMPLETE" in capsys.readouterr().err


def test_bench_exits_nonzero_on_corpus_pipeline_error(capsys):
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete(
            {"jaccard_prefix_near_pairs": 10.1, "corpus_pipeline_error": "boom"}, {}
        )
    assert exc.value.code == 1
    assert "corpus_pipeline_error" in capsys.readouterr().err


def test_bench_exits_nonzero_on_scale_path_error(capsys):
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete({}, {"transe_epoch_auto_error": "OOM"})
    assert exc.value.code == 1
    assert "transe_epoch_auto_error" in capsys.readouterr().err


def test_bench_complete_sections_do_not_exit():
    bench = _bench_module()
    # plain timing rows in every section: no exit, no trailer
    bench._fail_if_incomplete(
        {"jaccard_prefix_near_pairs": 10.1, "corpus_pipeline": 42.0},
        {"transe_epoch_auto": 6.15, "skew_join_aqe": 1.2},
    )


# ------------------------------------------- semantic-dedup assignment pin


def test_semantic_near_pairs_assignment_runs_once(spark):
    """VERDICT r09 advisory: the self-join of `binned` must read ONE
    pinned assignment subtree (repartition-on-cell + cache), not
    re-execute the Arrow kernel per join side. Structural check: the
    executed plan has exactly one MapInPandas node id and the join
    reads the cache on both sides (>=2 InMemoryTableScan ids)."""
    import re

    import numpy as np
    from pyspark.sql import functions as F

    from transe_pyspark_spark.operators.similarity import semantic_near_pairs

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    pairs = semantic_near_pairs(df, id_col="id", vec_col="emb",
                                threshold=0.2, n_cells=4, n_assign=2)
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_mip = len(set(re.findall(r"\((\d+)\) MapInPandas", plan)))
    n_imts = len(set(re.findall(r"\((\d+)\) InMemoryTableScan", plan)))
    assert n_mip == 1, f"assignment kernel appears {n_mip}x in the plan"
    assert n_imts >= 2, "both join sides should read the pinned cache"
    # and the pin must not change results: pairs are still symmetric-free
    got = pairs.collect()
    assert all(r.id_a < r.id_b for r in got)
