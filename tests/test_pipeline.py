"""curate_corpus (pipeline.py): the operator-library composition —
monotone per-stage survival, determinism under repartitioning, planted
dup/contaminated docs removed, and composability with packing/export."""

from __future__ import annotations

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.pipeline import curate_corpus
from sheetreader_duckdb_spark.tables import T


def test_stages_monotone_and_planted_rows_removed(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    # plant: an exact dup of doc 0 and an eval set overlapping doc 1
    extra = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    corpus = d.unionByName(extra)
    ev = d.filter(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 800000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    cur, report = curate_corpus(
        corpus, eval_df=ev, budget_tokens=2000, seed="t"
    )
    stages = dict(report)
    order = [s for s, _ in report]
    assert order == [
        "input", "quality", "exact_dedup", "near_dedup", "decontaminate",
        "temperature_mix", "budget",
    ]
    counts = [n for _, n in report]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    ids = {r.doc_id for r in cur.collect()}
    # the planted exact dup lost to its lower-id original
    assert 900000 not in ids
    # doc 1 is contaminated by the planted eval doc (identical text)
    assert 1 not in ids
    assert stages["decontaminate"] < stages["near_dedup"]


def test_deterministic_under_partitioning(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    a, _ = curate_corpus(d, budget_tokens=1500, collect_report=False)
    b, _ = curate_corpus(
        d.repartition(17), budget_tokens=1500, collect_report=False
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_composes_with_packing_and_export(spark, sf_dir, tmp_path):
    from sheetreader_duckdb_spark.operators.export import export_shards
    from sheetreader_duckdb_spark.operators.packing import pack_sequences

    d = T(spark, sf_dir, "documents")
    cur, _ = curate_corpus(d, collect_report=False)
    packed = pack_sequences(cur, "doc_id", F.col("n_chars"), seq_len=2048, n_buckets=4)
    assert packed.count() == cur.count()  # every survivor packed once
    out = str(tmp_path / "curated")
    export_shards(
        cur.select("doc_id", "text"), "doc_id", 4, out, seed="cur", format="json"
    )
    back = spark.read.schema("doc_id long, text string").json(out)
    assert back.count() == cur.count()
