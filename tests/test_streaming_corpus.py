"""Streaming corpus builder (streaming/corpus.py): incremental dedup
against the accepted corpus, idempotent batch-addressed commits, restart
safety via checkpointed batch ids."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sheetreader_duckdb_spark.streaming.corpus import (
    accept_batch,
    compact_corpus_state,
    read_corpus,
    recover_corpus_state,
    run_corpus_builder,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_accept_batch_dedups_within_and_across(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    b0 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1
    assert accept_batch(b0, 0, corpus, "doc_id", "text") == 2
    # Batch 1: one novel doc, one exact dup of the accepted corpus.
    b1 = _docs(spark, [(10, "beta"), (11, "gamma")])
    assert accept_batch(b1, 1, corpus, "doc_id", "text") == 1
    got = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus).collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (11, "gamma")]


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus2")
    accept_batch(_docs(spark, [(1, "a"), (2, "b")]), 0, corpus, "doc_id", "text")
    b1 = _docs(spark, [(3, "c"), (4, "a")])
    n_first = accept_batch(b1, 1, corpus, "doc_id", "text")
    # Redelivery of the SAME batch id (checkpoint replay after a crash
    # between the docs and digests writes): the batch's own digests are
    # invisible to its dedup, so the accept-set recomputes identically and
    # overwrites its own directories — no duplicates, no loss.
    n_retry = accept_batch(b1, 1, corpus, "doc_id", "text")
    assert n_first == n_retry == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [1, 2, 3]


NEAR_A = "the quick brown fox jumps over the lazy dog today"
# Prefix variant: every trigram of NEAR_A survives, so Jaccard = 8/9 and
# all four LSH bands collide — a reliable near-dup under (8 hashes, band
# size 2, k=3, threshold 0.5).
NEAR_A2 = "so " + NEAR_A
NEAR_B = "completely different words about training data pipelines at scale"
NEAR_C = "unrelated third document mentioning streaming corpus construction only"


def test_near_dup_rejected_across_batches(spark, tmp_path):
    corpus = str(tmp_path / "corpus_nd")
    b0 = _docs(spark, [(1, NEAR_A), (2, NEAR_B)])
    assert accept_batch(b0, 0, corpus, "doc_id", "text", near_dup=True) == 2
    # Batch 1: a near-dup of accepted doc 1 (one token differs -> Jaccard
    # well above 0.5 on 3-shingles) plus a novel doc.
    b1 = _docs(spark, [(10, NEAR_A2), (11, NEAR_C)])
    assert accept_batch(b1, 1, corpus, "doc_id", "text", near_dup=True) == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [1, 2, 11]
    # The stored residue tables cover exactly the accepted docs.
    bands = spark.read.option("basePath", f"{corpus}/bands").parquet(
        f"{corpus}/bands/batch=*"
    )
    assert sorted(
        r["doc_id"] for r in bands.select("doc_id").distinct().collect()
    ) == [1, 2, 11]


def test_near_dup_rejected_within_batch(spark, tmp_path):
    corpus = str(tmp_path / "corpus_nd2")
    # One batch carrying a near-dup pair: the larger id drops.
    b0 = _docs(spark, [(5, NEAR_A2), (3, NEAR_A), (7, NEAR_B)])
    assert accept_batch(b0, 0, corpus, "doc_id", "text", near_dup=True) == 2
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [3, 7]


def test_near_dup_redelivery_idempotent(spark, tmp_path):
    corpus = str(tmp_path / "corpus_nd3")
    accept_batch(
        _docs(spark, [(1, NEAR_A)]), 0, corpus, "doc_id", "text", near_dup=True
    )
    b1 = _docs(spark, [(2, NEAR_A2), (3, NEAR_B)])
    n_first = accept_batch(b1, 1, corpus, "doc_id", "text", near_dup=True)
    # Redelivery of the same batch id: its own band/shingle directories
    # (possibly partially written) are invisible to its dedup, so the
    # accept-set recomputes identically and overwrites its own dirs.
    n_retry = accept_batch(b1, 1, corpus, "doc_id", "text", near_dup=True)
    assert n_first == n_retry == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [1, 3]
    sh = spark.read.option("basePath", f"{corpus}/shingles").parquet(
        f"{corpus}/shingles/batch=*"
    )
    assert sorted(
        r["doc_id"] for r in sh.select("doc_id").distinct().collect()
    ) == [1, 3]


def _state_dirs(corpus, sub):
    import glob

    return sorted(glob.glob(f"{corpus}/{sub}/batch=*"))


def test_compaction_preserves_dedup_and_shrinks_layout(spark, tmp_path):
    corpus = str(tmp_path / "corpus_cp")
    for i, text in enumerate([NEAR_A, NEAR_B, NEAR_C]):
        accept_batch(
            _docs(spark, [(i * 10, text)]), i, corpus, "doc_id", "text",
            near_dup=True,
        )
    assert len(_state_dirs(corpus, "digests")) == 3
    merged = compact_corpus_state(spark, corpus)
    assert merged == {"digests": 2, "bands": 2, "shingles": 2}
    # Two directories per store: history merged under the highest MERGED
    # id, the newest batch untouched (it may still be redelivered).
    for sub in ("digests", "bands", "shingles"):
        assert _state_dirs(corpus, sub) == [
            f"{corpus}/{sub}/batch=1",
            f"{corpus}/{sub}/batch=2",
        ]
    # docs/ keeps its per-batch provenance directories.
    assert len(_state_dirs(corpus, "docs")) == 3
    # Dedup against the compacted state still works: an exact dup AND a
    # near dup of pre-compaction batches are both rejected.
    b3 = _docs(spark, [(50, NEAR_B), (51, NEAR_A2), (52, "fresh doc never seen before ok")])
    assert accept_batch(b3, 3, corpus, "doc_id", "text", near_dup=True) == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [0, 10, 20, 52]


def test_compaction_keeps_top_batch_redeliverable(spark, tmp_path):
    # Structured Streaming can redeliver the LAST batch after a crash (its
    # state dirs written, its commit log not). Compaction must not fold
    # history into a directory carrying the top batch's id — that would
    # hide every prior digest from the redelivery's `< batch_id` filter
    # and let duplicates into the corpus.
    corpus = str(tmp_path / "corpus_redeliver")
    accept_batch(_docs(spark, [(1, "alpha"), (2, "beta")]), 0, corpus, "doc_id", "text")
    accept_batch(_docs(spark, [(3, "gamma")]), 1, corpus, "doc_id", "text")
    # Top batch dups both an old batch's doc AND the most recent one.
    b2 = _docs(spark, [(4, "alpha"), (5, "gamma"), (6, "delta")])
    assert accept_batch(b2, 2, corpus, "doc_id", "text") == 1
    merged = compact_corpus_state(spark, corpus)
    assert merged["digests"] == 2  # batches 0+1 really merged (under id 1)
    assert _state_dirs(corpus, "digests") == [
        f"{corpus}/digests/batch=1",
        f"{corpus}/digests/batch=2",
    ]
    # Redelivery of the top batch AFTER compaction: identical accept-set —
    # the merged history (id 1 < 2) stays visible to its `< batch_id`
    # dedup filter.
    assert accept_batch(b2, 2, corpus, "doc_id", "text") == 1
    got = sorted(r["doc_id"] for r in read_corpus(spark, corpus).collect())
    assert got == [1, 2, 3, 6]


def test_compaction_crash_recovery(spark, tmp_path):
    import json
    import os
    import shutil

    corpus = str(tmp_path / "corpus_cr")
    for i, text in enumerate([NEAR_A, NEAR_B, NEAR_C]):
        accept_batch(_docs(spark, [(i, text)]), i, corpus, "doc_id", "text")
    base = f"{corpus}/digests"

    # Crash BEFORE the journal: merged tmp (possibly partial) written, no
    # plan — rollback drops the tmp, live dirs untouched.
    shutil.copytree(f"{base}/batch=0", f"{base}/compact_tmp")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=0", "batch=1", "batch=2"]

    # Crash AFTER the journal, mid-rename: plan + complete tmp present,
    # one of the two merged dirs renamed aside — roll FORWARD: install
    # batch=1 from the tmp, restore nothing, clean up.
    spark.read.parquet(f"{base}/batch=0", f"{base}/batch=1").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{base}/compact_tmp")
    with open(f"{base}/.compact.plan", "w") as f:
        json.dump({"merged": [0, 1], "target": 1}, f)
    os.rename(f"{base}/batch=0", f"{base}/.batch=0.old")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]
    merged_rows = spark.read.parquet(f"{base}/batch=1").count()
    assert merged_rows == 2  # both original digests present after roll-forward

    # Torn plan file (crash mid-journal-write): parse fails → rollback.
    shutil.copytree(f"{base}/batch=1", f"{base}/compact_tmp")
    with open(f"{base}/.compact.plan", "w") as f:
        f.write('{"merged": [0,')  # torn json
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]

    # Legacy MID-swap (.compact.tmp still present, live renamed aside):
    # the pre-journal swap never installed — restore the .old.
    shutil.copytree(f"{base}/batch=1", f"{base}/.compact.tmp")
    os.rename(f"{base}/batch=1", f"{base}/.batch=1.old")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]

    # Crash in the tail window: install committed, asides + tmp already
    # deleted, only the plan left. Recovery must NOT rename the installed
    # merged directory aside (the tmp it would re-install from is gone) —
    # it just drops the journal and keeps the live layout.
    with open(f"{base}/.compact.plan", "w") as f:
        json.dump({"merged": [0, 1], "target": 1}, f)
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]
    assert spark.read.parquet(f"{base}/batch=1").count() == 2

    # Legacy COMPLETED swap (no tmp anywhere, live missing): the merged
    # top directory already holds every .old's rows, so the leftover .old
    # is redundant and must be DROPPED — restoring it would duplicate
    # every one of its rows (doubled shingles corrupt Jaccard verify).
    os.rename(f"{base}/batch=1", f"{base}/.batch=1.old")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=2"]


def test_legacy_install_direction_crash_keeps_complete_copy(spark, tmp_path):
    """Legacy (pre-journal) swap crashed mid step 3's COPY phase under
    copy+delete rename semantics: live ``batch=<target>`` exists but is
    PARTIAL, while ``.compact.tmp`` and ``.batch=<target>.old`` hold the
    complete copies. The old 'a surviving live copy is the complete one'
    rollback deleted both complete copies and kept the partial live —
    data loss. Recovery must roll forward from the complete tmp."""
    import shutil

    corpus = str(tmp_path / "corpus_lidc")
    for i, text in enumerate([NEAR_A, NEAR_B, NEAR_C]):
        accept_batch(_docs(spark, [(i, text)]), i, corpus, "doc_id", "text")
    base = f"{corpus}/digests"
    # Build the complete merged tmp (batches 0+1 under target id 1).
    spark.read.parquet(f"{base}/batch=0", f"{base}/batch=1").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{base}/.compact.tmp")
    # Step 2 completed: both inputs renamed aside.
    os.rename(f"{base}/batch=0", f"{base}/.batch=0.old")
    os.rename(f"{base}/batch=1", f"{base}/.batch=1.old")
    # Step 3 crash mid-copy: live target holds only a strict subset of
    # the tmp's part files (here: the _SUCCESS marker and no data file).
    os.makedirs(f"{base}/batch=1")
    shutil.copy(f"{base}/.compact.tmp/_SUCCESS", f"{base}/batch=1/_SUCCESS")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]
    # Both merged digests survived — the partial live did not win.
    assert spark.read.parquet(f"{base}/batch=1").count() == 2


def test_streaming_end_to_end_with_restart(spark, tmp_path):
    inp = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus3")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)
    _docs(spark, [(1, "alpha"), (2, "beta")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_corpus_builder(
        spark, inp, corpus, ckpt, id_col="doc_id", text_col="text", schema=SCHEMA
    )
    assert read_corpus(spark, corpus).count() == 2
    # New files arrive (one dup, one novel); a RESTARTED query must drain
    # only the new files (checkpoint) and keep dedup guarantees.
    _docs(spark, [(3, "alpha"), (4, "delta")]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_corpus_builder(
        spark, inp, corpus, ckpt, id_col="doc_id", text_col="text", schema=SCHEMA
    )
    got = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus).collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (4, "delta")]


def test_inline_auto_compaction(spark, tmp_path):
    # compact_every runs compaction inside foreachBatch (the builder is
    # the single writer, so between-batch compaction cannot race a
    # reader). Five single-file batches with dups, compact every 2:
    # dedup semantics must be unchanged and the state layout must have
    # merged (fewer digest dirs than batches).
    import time

    inp = str(tmp_path / "in_ac")
    corpus = str(tmp_path / "corpus_ac")
    ckpt = str(tmp_path / "ckpt_ac")
    os.makedirs(inp)
    batches = [
        [(1, "alpha")],
        [(2, "beta")],
        [(3, "alpha")],   # dup of batch 0
        [(4, "gamma")],
        [(5, "beta"), (6, "delta")],  # one dup, one novel
    ]
    for rows in batches:
        _docs(spark, rows).coalesce(1).write.mode("append").parquet(inp)
        time.sleep(0.05)  # distinct mtimes -> stable file-source ordering
    run_corpus_builder(
        spark, inp, corpus, ckpt, id_col="doc_id", text_col="text",
        schema=SCHEMA, compact_every=2, max_files_per_trigger=1,
    )
    kept = sorted(r["text"] for r in read_corpus(spark, corpus).collect())
    assert kept == ["alpha", "beta", "delta", "gamma"]
    # 5 batches committed, but compaction (after batches 1 and 3) merged
    # history: the digests store holds fewer directories than batches.
    n_dirs = len(_state_dirs(corpus, "digests"))
    assert n_dirs < 5
    # No journal/tmp/aside debris left behind.
    leftovers = [
        p for p in os.listdir(f"{corpus}/digests")
        if not p.startswith("batch=")
    ]
    assert leftovers == []


def test_interval_join_feeds_corpus_builder_composition(spark, tmp_path):
    """Composition of the two streaming features: a watermarked
    stream-stream interval join's output feeds the corpus builder through
    foreachBatch. Asserts (a) the end-to-end result equals the batch twin
    (interval join on batch frames -> exact dedup), (b) a restarted drain
    with new arrivals keeps exactly-once corpus semantics even when the
    join re-emits a pair whose text was already accepted, and (c) a
    from-scratch replay reproduces the corpus byte-identically."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sheetreader_duckdb_spark.streaming.corpus import accept_batch, read_corpus
    from sheetreader_duckdb_spark.streaming.events import interval_join

    ev_schema = "event_id long, user_id long, ts timestamp"

    def ts(minute):
        return dt.datetime(2026, 1, 1, 10, minute)

    def write_events(path, rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    os.makedirs(left_dir)
    os.makedirs(right_dir)
    # user 1: one left event pairing with two rights; user 2: one pair.
    write_events(left_dir, [(100, 1, ts(30)), (101, 2, ts(30))])
    write_events(right_dir, [(200, 1, ts(25)), (201, 1, ts(35)), (202, 2, ts(31))])

    def doc_frame(joined):
        # One doc per joined pair: content-addressed text, stable id.
        text = F.concat_ws(":", "user_id", "event_id", "event_id_r")
        return joined.select(
            F.xxhash64(text).alias("doc_id"), text.alias("text")
        )

    def drain(corpus, ckpt):
        lstream = spark.readStream.schema(ev_schema).parquet(left_dir)
        rstream = spark.readStream.schema(ev_schema).parquet(right_dir)
        joined = interval_join(
            lstream, rstream, on="user_id",
            lower="10 minutes", upper="10 minutes", watermark="1 hour",
        )

        def handle(batch_df, batch_id):
            accept_batch(doc_frame(batch_df), batch_id, corpus, "doc_id", "text")

        q = (
            joined.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    corpus = str(tmp_path / "corpus_ij")
    ckpt = str(tmp_path / "ckpt_ij")
    drain(corpus, ckpt)
    got1 = sorted(r["text"] for r in read_corpus(spark, corpus).collect())
    assert got1 == ["1:100:200", "1:100:201", "2:101:202"]

    # New arrivals: a genuinely new pair (user 2) and a left event that
    # re-creates an ALREADY-ACCEPTED text's pair via a duplicate-delivery
    # shaped input (same user/event ids as before — the join happily
    # re-emits it; the corpus builder's digest check must reject it).
    write_events(left_dir, [(102, 2, ts(40)), (100, 1, ts(30))])
    drain(corpus, ckpt)
    got2 = sorted(r["text"] for r in read_corpus(spark, corpus).collect())
    assert got2 == ["1:100:200", "1:100:201", "2:101:202", "2:102:202"]

    # Batch twin: the same interval join over batch frames, exact-deduped.
    lb = spark.read.schema(ev_schema).parquet(left_dir)
    rb = spark.read.schema(ev_schema).parquet(right_dir)
    expected = sorted(
        r["text"]
        for r in doc_frame(
            interval_join(lb, rb, on="user_id", lower="10 minutes", upper="10 minutes")
        )
        .select("text")
        .distinct()
        .collect()
    )
    assert got2 == expected

    # From-scratch replay determinism: fresh corpus + checkpoint over the
    # same inputs reproduces the identical accepted set.
    corpus2 = str(tmp_path / "corpus_ij2")
    drain(corpus2, str(tmp_path / "ckpt_ij2"))
    got3 = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus2).collect()
    )
    ref = sorted(
        (r["doc_id"], r["text"]) for r in read_corpus(spark, corpus).collect()
    )
    assert got3 == ref


def test_legacy_aside_delete_phase_crash_rolls_forward(spark, tmp_path):
    """Legacy swap crashed in STEP 2's aside-rename DELETE phase under
    copy+delete semantics: .batch=0.old is COMPLETE while live batch=0 is
    a PARTIAL leftover of the interrupted delete. The old rollback kept
    the partial live and deleted the complete aside AND the complete
    merged tmp. Recovery must roll forward from the tmp."""
    import shutil

    corpus = str(tmp_path / "corpus_ladp")
    for i, text in enumerate([NEAR_A, NEAR_B, NEAR_C]):
        accept_batch(_docs(spark, [(i, text)]), i, corpus, "doc_id", "text")
    base = f"{corpus}/digests"
    spark.read.parquet(f"{base}/batch=0", f"{base}/batch=1").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{base}/.compact.tmp")
    # Aside rename of batch=0: copy completed, delete interrupted — the
    # live dir keeps only the _SUCCESS marker (a strict subset).
    shutil.copytree(f"{base}/batch=0", f"{base}/.batch=0.old")
    for f in os.listdir(f"{base}/batch=0"):
        if f != "_SUCCESS":
            os.remove(os.path.join(f"{base}/batch=0", f))
    # batch=1's aside rename had not started yet.
    shutil.copytree(f"{base}/batch=1", f"{base}/.batch=1.old")
    shutil.rmtree(f"{base}/batch=1")
    assert "digests" in recover_corpus_state(spark, corpus)
    assert sorted(os.listdir(base)) == ["batch=1", "batch=2"]
    # Both merged digests survived the partial-live trap.
    assert spark.read.parquet(f"{base}/batch=1").count() == 2
