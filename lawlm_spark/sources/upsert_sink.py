"""Python Data Source WRITER (Spark 4): the upsert sink as a registered
format — `df.write.format("upsert_mirror").option("path", ...)`.

The reference engine's vector upsert (data_extraction.py:279-317 ->
qdrant_manager.py:38-43) is a client loop: batch, POST, hope.  The
Spark-native re-expression is a sink with a REAL two-phase commit:

  * each task serializes its partition to a private temp file and
    returns a WriterCommitMessage (path + row count) — no task ever
    touches shared state;
  * commit() (driver, runs once, only if EVERY task succeeded) moves
    the temp files into a new generation directory and writes the
    manifest LAST — the manifest is the atomic commit point, so a crash
    anywhere leaves either the old state or the new state, never a
    torn mix (the same swap-last discipline as mirror compaction and
    the CDC pointer);
  * abort() removes the temp files; an aborted job is invisible.

Upsert semantics live in the READ merge: `read_upsert_mirror` keeps the
latest generation's row per key (last-writer-wins across generations) —
the same resolution rule as relational.merge_changes.  At scale each
generation is one append-only directory; compaction folds old
generations exactly like sources/mirror.compact_mirror.

The payload format is JSONL for transparency (this sink doubles as the
"ship rows to an external service" template: swap `_write_rows` for the
HTTP client, keep the commit protocol).  No oracle row — a filesystem
sink, like O8's DDL (COVERAGE.md API-only ledger); the commit protocol
is pinned by tests/test_upsert_sink.py including a mid-job task failure
leaving state untouched.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _TaskFile(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class UpsertMirrorWriter(DataSourceWriter):
    def __init__(self, options: dict, schema):
        self.path = options["path"]
        self.key_col = options.get("key_col", "point_id")
        # test hook: a key equal to fail_marker raises mid-task, proving
        # abort leaves the committed state untouched
        self.fail_marker = options.get("fail_marker")
        self.columns = list(schema.fieldNames())
        if self.key_col not in self.columns:
            raise ValueError(
                f"key_col {self.key_col!r} not in schema {self.columns}"
            )

    def write(self, iterator) -> WriterCommitMessage:
        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(tmp_dir, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                d = {c: row[i] for i, c in enumerate(self.columns)}
                if self.fail_marker is not None and str(d[self.key_col]) == self.fail_marker:
                    raise RuntimeError(f"injected failure on key {self.fail_marker}")
                f.write(json.dumps(d, default=str) + "\n")
                n += 1
        return _TaskFile(tmp, n)

    def commit(self, messages) -> None:
        gens = [
            int(d.split("-", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("gen-") and os.path.isdir(os.path.join(self.path, d))
        ]
        gen = max(gens, default=-1) + 1
        gen_dir = os.path.join(self.path, f"gen-{gen}")
        os.makedirs(gen_dir)
        files, total = [], 0
        for i, m in enumerate(messages):
            dst = os.path.join(gen_dir, f"part-{i:05d}.jsonl")
            os.replace(m.path, dst)
            files.append(os.path.basename(dst))
            total += m.n_rows
        manifest = {"generation": gen, "files": files, "n_rows": total}
        tmp_manifest = os.path.join(gen_dir, "_manifest.tmp")
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        # the atomic commit point: readers ignore generations without it
        os.replace(tmp_manifest, os.path.join(gen_dir, "manifest.json"))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.path)
            except FileNotFoundError:
                pass


class UpsertMirrorDataSource(DataSource):
    """df.write.format('upsert_mirror').option('path', dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "upsert_mirror"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return UpsertMirrorWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(UpsertMirrorDataSource)


def committed_generations(path: str) -> list[int]:
    """Generations whose manifest exists — the only ones a reader sees."""
    out = []
    for d in sorted(os.listdir(path)):
        if d.startswith("gen-") and os.path.exists(
            os.path.join(path, d, "manifest.json")
        ):
            out.append(int(d.split("-", 1)[1]))
    return sorted(out)


def read_upsert_mirror(spark, path: str, schema: str, key_col: str = "point_id"):
    """Latest-generation-wins merge over all committed generations —
    the upsert resolution, distributed (one window on the key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gens = committed_generations(path)
    if not gens:
        raise ValueError(f"no committed generations under {path}")
    dfs = None
    for g in gens:
        df = (
            spark.read.schema(schema)
            .json(os.path.join(path, f"gen-{g}", "part-*.jsonl"))
            .withColumn("_gen", F.lit(g))
        )
        dfs = df if dfs is None else dfs.unionByName(df)
    w = Window.partitionBy(key_col).orderBy(F.desc("_gen"))
    return (
        dfs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_gen")
    )
