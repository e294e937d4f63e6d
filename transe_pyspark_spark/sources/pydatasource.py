"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API):
a partitioned, deterministic knowledge-graph triple generator.

The reference ingests its graph from a TSV file (`utils.py:5-59`);
at benchmark/CI scale you want the same shape WITHOUT shipping a
file — a source that *plans partitions* and generates each one
executor-side. This is the idiomatic Spark 4 way to add such a
source: subclass ``DataSource``/``DataSourceReader``, emit
``InputPartition``s so the scan parallelizes like any file scan
(one task per partition, no driver materialization, no
``parallelize`` of driver-built rows), and register per-session.

Determinism contract: row ``i`` of the global output is a pure
closed-form function of ``i`` (LCG-style mixing with BIGINT-safe
constants), so a SQL engine can replicate the whole table from
``generate_series`` — the DuckDB oracle does exactly that, which
makes the custom-source path itself oracle-checkable end-to-end.

Options (all integers, passed as strings per the DataSource API):
``n_rows`` (default 10_000), ``n_entities`` (1_000),
``n_relations`` (20), ``n_partitions`` (8).

Formulas for global row i (all mod-arithmetic in BIGINT range —
multipliers chosen so i * a < 2^63 for any i < 2^40):
  h = (i * 40503 + 7)  % n_entities
  l = (i * 69621 + 3)  % n_relations
  t = (i * 16807 + 11) % n_entities
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _TriplesPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticTriplesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_entities = int(options.get("n_entities", 1_000))
        self.n_relations = int(options.get("n_relations", 20))
        self.n_partitions = int(options.get("n_partitions", 8))
        if min(self.n_rows, self.n_entities, self.n_relations, self.n_partitions) < 1:
            raise ValueError("all kg_triples options must be >= 1")
        self.l_eq: int | None = None

    def _residues(self) -> list[int]:
        """Residue classes of i (mod n_relations) whose generated l
        equals the pushed constant — n_relations driver-side probes."""
        nr, v = self.n_relations, self.l_eq
        return [r for r in range(nr) if (r * 69621 + 3) % nr == v]

    def partitions(self) -> list[InputPartition]:
        # contiguous row ranges — each task generates its own slice,
        # nothing is materialized on the driver
        per = -(-self.n_rows // self.n_partitions)
        return [
            _TriplesPartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _TriplesPartition):
        ne, nr = self.n_entities, self.n_relations
        if self.l_eq is None:
            for i in range(partition.start, partition.end):
                yield (
                    (i * 40503 + 7) % ne,
                    (i * 69621 + 3) % nr,
                    (i * 16807 + 11) % ne,
                )
            return
        # pushed l = const: walk only the satisfying residue classes —
        # the generator never touches non-matching i
        for r in self._residues():
            first = partition.start + ((r - partition.start) % nr)
            for i in range(first, partition.end, nr):
                yield (
                    (i * 40503 + 7) % ne,
                    self.l_eq,
                    (i * 16807 + 11) % ne,
                )


class SyntheticTriplesPushdownReader(SyntheticTriplesReader):
    """The pushdown-capable variant, selected by
    ``option("pushdown", "true")``. Separate class ON PURPOSE: Spark
    4.1 REFUSES to initialize any reader that merely *implements*
    ``pushFilters`` while ``spark.sql.python.filterPushdown.enabled``
    is false (DATA_SOURCE_PUSHDOWN_DISABLED) — so the default reader
    must not define the method at all, or every plain read under a
    stock session (the driver harness) would fail."""

    def pushFilters(self, filters):
        # Accept `l = <const>` (the selective predicate a KG scan
        # actually sees — per-relation reads). Because
        # l = (i·69621 + 3) % n_relations is a congruence in i, read()
        # SKIPS non-matching rows generatively: it walks only the
        # satisfying residue classes mod n_relations, so the scan
        # emits ~|rows|/n_relations rows instead of filtering after
        # the fact. Everything else stays Spark-side (each yielded
        # filter must be one of the inputs, by reference).
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("l",)
                and isinstance(f.value, int)
                and self.l_eq is None
            ):
                self.l_eq = int(f.value)
            else:
                yield f


class SyntheticTriplesStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant (Spark 4 ``simpleStreamReader``): the same
    deterministic row space drips in ``batch_rows``-sized micro-batch
    increments with the global row index as the OFFSET — so restarts
    replay exactly (the offset log pins [start, end) row ranges, and
    row i is a pure function of i). A bounded stream (``n_rows``)
    reports an unmoving offset with an empty batch once exhausted,
    which lets ``Trigger.AvailableNow`` terminate."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_entities = int(options.get("n_entities", 1_000))
        self.n_relations = int(options.get("n_relations", 20))
        self.batch_rows = int(options.get("batch_rows", 1_000))
        if min(self.n_rows, self.n_entities, self.n_relations, self.batch_rows) < 1:
            raise ValueError("all kg_triples options must be >= 1")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, i0: int, i1: int) -> list:
        # a LIST, not a generator: the engine's driver-side prefetch
        # cache copy.copy()s the returned iterator on every consumer
        # (pyspark datasource_internal.getCache), and generators are
        # neither copyable nor picklable — a generator here hangs the
        # stream with "cannot pickle 'generator' object"
        ne, nr = self.n_entities, self.n_relations
        return [
            (
                (i * 40503 + 7) % ne,
                (i * 69621 + 3) % nr,
                (i * 16807 + 11) % ne,
            )
            for i in range(i0, i1)
        ]

    def read(self, start: dict):
        i0 = int(start["i"])
        i1 = min(i0 + self.batch_rows, self.n_rows)
        return iter(self._rows(i0, i1)), {"i": i1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path after restart: regenerate the exact range
        return iter(self._rows(int(start["i"]), int(end["i"])))


class SyntheticTriplesDataSource(DataSource):
    """``spark.read.format("kg_triples")`` after
    ``spark.dataSource.register(SyntheticTriplesDataSource)``; also
    streamable via ``spark.readStream.format("kg_triples")``."""

    @classmethod
    def name(cls) -> str:
        return "kg_triples"

    def schema(self) -> str:
        return "h bigint, l bigint, t bigint"

    def reader(self, schema) -> SyntheticTriplesReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return SyntheticTriplesPushdownReader(self.options)
        return SyntheticTriplesReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticTriplesStreamReader:
        return SyntheticTriplesStreamReader(self.options)


@dataclass
class _TsvCommit(WriterCommitMessage):
    temp_file: str
    n_rows: int


class TsvTriplesWriter(DataSourceWriter):
    """Two-phase-commit TSV writer: each task writes its rows to a
    temp file and returns a commit message; only the DRIVER's
    ``commit`` renames temps into ``part-<i>.tsv`` and stamps
    ``_SUCCESS`` — so a retried/failed task can never leave a
    partially-visible file (``abort`` removes the temp dir). Append
    mode numbers its files past the highest committed ``part-`` index
    and keeps ``_SUCCESS`` cumulative, so successive writes never
    replace each other's output. The same
    protocol Spark's own file sinks run, spelled out in Python. The
    target path must be on storage every task can reach (the standard
    file-sink contract; on local[n] any local dir works)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path") or options.get("__path__")
        if not self.path:
            raise ValueError('kg_tsv sink requires .option("path", ...) or save(path)')
        self.sep = options.get("sep", "\t")
        self.overwrite = overwrite

    def _tmp(self) -> str:
        return os.path.join(self.path, "_temp")

    def write(self, iterator) -> _TsvCommit:
        os.makedirs(self._tmp(), exist_ok=True)
        f = os.path.join(self._tmp(), f"{uuid.uuid4().hex}.tsv")
        n = 0
        with open(f, "w") as out:
            for row in iterator:
                out.write(self.sep.join(str(v) for v in row) + "\n")
                n += 1
        return _TsvCommit(temp_file=f, n_rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        offset, prev_rows = 0, 0
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        else:
            # append: number new files past the highest committed index
            # so a prior write's part files are never replaced, and
            # carry the prior _SUCCESS count so the manifest stays the
            # directory's cumulative row count
            existing = [
                int(n[len("part-"):][:5])
                for n in os.listdir(self.path)
                if n.startswith("part-") and n[len("part-"):][:5].isdigit()
            ]
            offset = max(existing) + 1 if existing else 0
            success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success):
                with open(success) as f:
                    prev_rows = int(f.read().strip() or 0)
        total = prev_rows
        for i, m in enumerate(messages):
            os.replace(m.temp_file, os.path.join(self.path, f"part-{offset + i:05d}.tsv"))
            total += m.n_rows
        shutil.rmtree(self._tmp(), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(f"{total}\n")

    def abort(self, messages) -> None:
        shutil.rmtree(self._tmp(), ignore_errors=True)


class TsvTriplesSink(DataSource):
    """``df.write.format("kg_tsv").option("path", d).mode(...)`` —
    writes any DataFrame as separator-joined text, the reference's
    triple-TSV layout (`utils.py:5-28` reads this shape back)."""

    @classmethod
    def name(cls) -> str:
        return "kg_tsv"

    def writer(self, schema, overwrite: bool) -> TsvTriplesWriter:
        return TsvTriplesWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent per-session registration (re-registering the same
    name is a no-op error we swallow: the API has no exists-check)."""
    for cls in (SyntheticTriplesDataSource, TsvTriplesSink):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass
