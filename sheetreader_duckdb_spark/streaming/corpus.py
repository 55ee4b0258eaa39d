"""Streaming corpus builder: file-arrival document stream → incremental
exact dedup against the accepted corpus → idempotent append.

The production loop every training corpus runs continuously: crawl batches
arrive as files; each batch is deduplicated against everything accepted so
far WITHOUT rereading the corpus (the accepted side contributes only its
stored digest table, operators/dedup.py incremental_exact_dedup), and the
survivors append. Composes the existing operators under Structured
Streaming's ``foreachBatch``.

Layout under ``corpus_path``::

    docs/batch=<id>/      accepted documents of micro-batch <id>
    digests/batch=<id>/   their content digests (h)
    bands/batch=<id>/     near-dup mode: their LSH band table (id, band, band_key)
    shingles/batch=<id>/  near-dup mode: their shingle table (id, sh)

``near_dup=True`` layers MinHash/LSH near-duplicate rejection on top of the
exact digest check: arriving docs are dropped when they near-match the
accepted corpus (band equi-join against the stored band tables + exact
Jaccard verify against the stored shingles — the corpus side is its
precomputed residue tables, never the documents) or another doc of the
same batch (pairwise: the larger id of every verified in-batch pair is
dropped). Each accepted batch then stores its own band/shingle tables, so
the corpus-side state stays build-once/append-only — identical
incremental posture to the digest store, just two more batch-addressed
directories.

Exactly-once without a transaction log — the batch id IS the commit token:

* Both writes go to batch-addressed directories in ``overwrite`` mode, so
  a redelivered micro-batch (failure after partial write, checkpoint
  replay) overwrites its own directories instead of appending twice.
* The dedup anti-join reads digests of batches ``< batch_id`` ONLY. On
  redelivery the batch's own (possibly partially committed) digests are
  therefore invisible to its dedup, and the recomputed accept-set is
  byte-identical — idempotence holds even when the previous attempt died
  between the two writes.
* Batch-id partition directories also give readers partition pruning and
  make per-batch provenance a directory listing.

At 100 TB: per-batch work is batch-proportional (the corpus side is its
digest column, ~16 bytes/doc); the docs write is append-shaped (new
directories only); compaction of many small batch directories is an
offline rewrite, deliberately out of band like any LSM-ish layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.dedup import content_digest

__all__ = [
    "accept_batch",
    "run_corpus_builder",
    "read_corpus",
    "compact_corpus_state",
    "recover_corpus_state",
]

_STATE_STORES = ("digests", "bands", "shingles")


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """All accepted documents (batch provenance in the ``batch`` column)."""
    return spark.read.option("basePath", f"{corpus_path}/docs").parquet(
        f"{corpus_path}/docs/batch=*"
    )


def _prior_table(
    spark: SparkSession, corpus_path: str, sub: str, batch_id: int, schema: str
) -> DataFrame:
    """Rows of ``<corpus_path>/<sub>/batch=*`` for batches < ``batch_id``.

    Directory listing through the Hadoop FS API (operators/fsutil), so the
    builder dedups correctly on the object storage a real corpus lives on;
    a driver-local glob would silently return [] there and disable dedup.
    Explicit schema: a batch directory left data-less by a crash between
    the per-batch writes must not break schema inference on the redelivery
    that would repair it.
    """
    from sheetreader_duckdb_spark.operators import fsutil

    dirs = fsutil.glob_dirs(spark, f"{corpus_path}/{sub}/batch=*")
    if not dirs:
        return spark.createDataFrame([], schema)
    cols = [s.strip().split(" ")[0] for s in schema.split(",")]
    return (
        spark.read.schema(schema)
        .option("basePath", f"{corpus_path}/{sub}")
        .parquet(f"{corpus_path}/{sub}/batch=*")
        .withColumn(
            "batch",
            F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1).cast("long"),
        )
        .filter(F.col("batch") < batch_id)
        .select(*cols)
    )


def accept_batch(
    batch: DataFrame,
    batch_id: int,
    corpus_path: str,
    id_col: str,
    text_col: str,
    near_dup: bool = False,
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    max_bucket_size: int | None = 1000,
) -> int:
    """Dedup one micro-batch against the accepted corpus and commit it under
    its batch id. Returns the number of accepted rows. Idempotent per
    (batch content, batch_id) — see the module docstring. ``near_dup=True``
    additionally rejects MinHash/LSH near-duplicates (of the accepted
    corpus via its stored band/shingle tables, and within the batch —
    pairwise, the larger id of each Jaccard-verified pair drops) and
    stores the accepted rows' band/shingle tables for future batches.
    ``max_bucket_size`` caps the in-batch candidate expansion (a template-
    spam cluster surviving exact dedup would otherwise expand O(size²)
    pairs in one bucket; dropped buckets are auditable via
    ``dedup.lsh_oversized_buckets`` on the batch's band table)."""
    from sheetreader_duckdb_spark.operators.dedup import (
        incremental_neardup_drop,
        jaccard_verify,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures_md5,
        word_shingles,
    )

    spark = batch.sparkSession
    prior = _prior_table(spark, corpus_path, "digests", batch_id, "h string")
    # distinct() first: a redelivered source commonly carries byte-identical
    # duplicate ROWS, which a keep-min-id-per-digest semi join would pass
    # through twice. (Rows sharing an id+digest but differing elsewhere are
    # a caller-contract violation, as in incremental_exact_dedup.)
    withd = batch.distinct().withColumn("__h", content_digest(text_col))
    novel = withd.join(prior.select(F.col("h").alias("__h")), "__h", "left_anti")
    # Exact dedup WITHIN the batch (min id per digest), like
    # incremental_exact_dedup — inlined so the digest column is computed
    # once and reused for the digest-store write. accepted derives from
    # novel (already anti-joined against prior — no second prior join).
    keep = novel.groupBy("__h").agg(F.min(id_col).alias(id_col))
    accepted = novel.join(keep.select(id_col), id_col, "left_semi")

    bands_b = sh_b = None
    if near_dup:
        # Checkpoint the exact-survivor set once: the shingle/band lineage
        # below feeds the corpus check, the in-batch check, AND the band/
        # shingle store writes.
        accepted = accepted.localCheckpoint()
        sh_b = word_shingles(accepted, id_col, text_col, k=k)
        sig_b = minhash_signatures_md5(sh_b, id_col, n_hashes=n_hashes)
        bands_b = lsh_bands(sig_b, id_col, n_hashes=n_hashes, band_size=band_size)
        # Stored tables carry the batch's actual id type — a corpus keyed
        # by string ids must read back with the same schema.
        id_type = batch.schema[id_col].dataType.simpleString()
        prior_bands = _prior_table(
            spark, corpus_path, "bands", batch_id,
            f"{id_col} {id_type}, band int, band_key string",
        )
        prior_sh = _prior_table(
            spark, corpus_path, "shingles", batch_id,
            f"{id_col} {id_type}, sh string",
        )
        # vs the accepted corpus: the shared operator (candidate-pruned
        # corpus side, batch-proportional), with the batch tables passed in
        # so the shingle/band lineage is built once for check + store.
        drop_corpus = incremental_neardup_drop(
            accepted, id_col, text_col, prior_bands, prior_sh,
            threshold=threshold, n_hashes=n_hashes, band_size=band_size, k=k,
            new_shingles=sh_b, new_bands=bands_b,
        )
        # within the batch: candidate pairs among the batch's own bands
        # (bucket expansion capped), verified on its shingles; drop the
        # larger id of each pair.
        pairs_b = lsh_candidate_pairs(bands_b, id_col, max_bucket_size=max_bucket_size)
        drop_within = (
            jaccard_verify(sh_b, pairs_b, id_col, threshold=threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        drop = drop_corpus.unionByName(drop_within).distinct()
        accepted = accepted.join(drop, id_col, "left_anti")

    accepted = accepted.localCheckpoint()  # one computation for all writes
    n = accepted.count()
    (
        accepted.drop("__h")
        .write.mode("overwrite")
        .parquet(f"{corpus_path}/docs/batch={batch_id}")
    )
    (
        accepted.select(F.col("__h").alias("h"))
        .write.mode("overwrite")
        .parquet(f"{corpus_path}/digests/batch={batch_id}")
    )
    if near_dup:
        ids = accepted.select(id_col)
        (
            bands_b.join(ids, id_col, "left_semi")
            .write.mode("overwrite")
            .parquet(f"{corpus_path}/bands/batch={batch_id}")
        )
        (
            sh_b.join(ids, id_col, "left_semi")
            .write.mode("overwrite")
            .parquet(f"{corpus_path}/shingles/batch={batch_id}")
        )
    return n


def _batch_id(path: str) -> int:
    return int(path.rsplit("=", 1)[1].rstrip("/").removesuffix(".old").rstrip("."))


def recover_corpus_state(spark: SparkSession, corpus_path: str) -> list[str]:
    """Restore a consistent state layout after a crashed compaction.

    The compaction journal (``.compact.plan``, written atomically AFTER
    the merged tmp is complete and BEFORE any live directory moves) makes
    recovery deterministic:

    * plan present and parseable → the merged data in ``compact_tmp`` is
      complete: ROLL FORWARD — re-run the rename-aside/install/cleanup
      steps from the plan. Every step is idempotent, so a crash during
      recovery just means recovery runs again.
    * no plan (or a torn, unparseable one) → no live directory was moved
      by the journaled protocol: ROLL BACK — drop the tmp and the torn
      plan. Stray ``.batch=<i>.old`` dirs without a plan come from the
      PRE-journal layout and are reconciled by ``_recover_legacy_swap``,
      which does NOT assume atomic renames: whichever of
      {``.compact.tmp``, live ``batch=<top>``} holds more readable rows
      is the complete merged copy (the legacy protocol never lets both
      be partial at once) and is rolled FORWARD via a committed
      overwrite install; every merged source (asides and un-renamed
      live inputs) is then dropped, since restoring them next to the
      merged directory would DUPLICATE state rows (doubled
      shingle/band counts corrupt Jaccard).

    Returns the stores touched. Run this (or ``compact_corpus_state``,
    which runs it first) before restarting the builder after a crash.
    """
    from sheetreader_duckdb_spark.operators import fsutil

    touched = []
    for sub in _STATE_STORES:
        base = f"{corpus_path}/{sub}"
        plan_path = f"{base}/.compact.plan"
        tmp = f"{base}/compact_tmp"
        plan = None
        raw = fsutil.read_text(spark, plan_path)
        if raw is not None:
            import json

            try:
                plan = json.loads(raw)
            except ValueError:
                plan = None  # torn write: no renames can have happened
        legacy_tmp = f"{base}/.compact.tmp"
        olds = fsutil.glob_dirs(spark, f"{base}/.batch=*.old")
        if (
            plan is None
            and raw is None
            and not olds
            and not fsutil.exists(spark, tmp)
            and not fsutil.exists(spark, legacy_tmp)
        ):
            continue
        touched.append(sub)
        if plan is not None:
            _install_compacted(spark, base, plan)
        else:
            # Journaled-protocol rollback: a tmp without a plan means no
            # live directory was ever moved — drop the tmp / torn plan.
            # Leftover .olds cannot belong to the journaled protocol
            # (its .olds are only ever deleted BEFORE the plan), so any
            # .old here is a pre-journal legacy layout.
            fsutil.delete(spark, tmp)
            fsutil.delete(spark, plan_path)
            if olds:
                _recover_legacy_swap(spark, base, legacy_tmp, olds)
            else:
                # Legacy step-1 crash (merged tmp incomplete, every live
                # directory untouched): plain rollback.
                fsutil.delete(spark, legacy_tmp)
    return touched


def _count_or_none(spark: SparkSession, path: str) -> int | None:
    """Row count of a parquet directory, or None if it cannot be read
    (missing, or torn mid-copy so a part file is truncated)."""
    try:
        return spark.read.parquet(path).count()
    except Exception:  # noqa: BLE001 — recovery probe, any failure = unreadable
        return None


def _recover_legacy_swap(
    spark: SparkSession, base: str, legacy_tmp: str, olds: list[str]
) -> None:
    """Reconcile a crashed PRE-journal compaction swap (``.compact.tmp`` +
    ``.batch=<i>.old`` layout) without assuming atomic renames.

    The legacy protocol was: (1) write merged rows to ``.compact.tmp``;
    (2) rename every merge-input ``batch=<i>`` aside; (3) rename the tmp
    in as ``batch=<target>`` (target = highest merged id); (4) delete the
    asides. Under copy+delete rename semantics the key invariant is: the
    tmp stays COMPLETE until step 3's delete phase begins, and that phase
    only begins once the installed ``batch=<target>`` copy is complete —
    so at every step-3 crash point at least one of {tmp, live target}
    holds the complete merged rows, and the one with MORE readable rows
    is it (a partial copy holds a strict subset of the part files).
    The previous rule here — 'a surviving live copy is the complete one'
    — held for the aside direction but was INVERTED for the install
    direction: a crash mid step 3's copy left a partial live target that
    the old rollback kept while deleting the complete tmp and aside.

    Decision tree (asides present, plan absent):

    * tmp absent → the swap installed; asides are redundant copies of
      rows the merged target already holds — drop them (restoring would
      double shingle/band rows and corrupt Jaccard verification).
    * tmp present, some NON-target aside still has a live counterpart →
      crash mid step 2 (the install cannot have started: step 3 runs
      only after every aside rename finished), which means step 1 HAD
      finished and the tmp is a complete copy of the merged rows — roll
      FORWARD from it (install + drop inputs/asides). Live dirs are NOT
      trusted here: a crash in an aside rename's delete phase leaves a
      partial live dir whose complete copies are the aside and the tmp.
    * tmp present otherwise → step-2-complete or step-3 crash: compare
      readable row counts of tmp vs live target and ROLL FORWARD from
      whichever is larger (ties: both complete, keep live) via a
      committed Spark overwrite install, then drop asides + tmp.

    Residual documented assumption: a layout from the short-lived
    merge-ALL-batches legacy variant, crashed between two aside renames
    with later inputs not yet renamed, is reconciled as if the
    not-yet-renamed inputs were outside the merge — their rows stay live
    and also sit inside the installed merge, so digest dedup (semi-join,
    duplicate-tolerant) survives but shingle counts can double for those
    batches; atomic-rename stores (POSIX/HDFS) never hit this.
    """
    from sheetreader_duckdb_spark.operators import fsutil

    old_ids = sorted(_batch_id(o) for o in olds)
    target = old_ids[-1]
    target_live = f"{base}/batch={target}"
    if not fsutil.exists(spark, legacy_tmp):
        for old in olds:
            fsutil.delete(spark, old)
        return
    survivors = {
        i for i in old_ids if fsutil.exists(spark, f"{base}/batch={i}")
    }
    if survivors - {target}:
        # Mid step 2: the install never started (step 3 only runs after
        # every aside rename). Step 1 HAD completed before step 2 began,
        # so the tmp holds the COMPLETE merged rows — roll FORWARD from
        # it rather than trusting live dirs. (The previous rollback
        # trusted 'a surviving live copy is complete', but under
        # copy+delete rename semantics a crash in an aside rename's
        # DELETE phase leaves a PARTIAL live dir while the complete
        # copies are the aside and the tmp — that rule deleted both
        # complete copies. Rolling forward from the tmp is correct at
        # every step-2 crash point: merged = exact union of the inputs.)
        spark.read.parquet(legacy_tmp).write.mode("overwrite").parquet(target_live)
        for old in olds:
            i = _batch_id(old)
            if i != target:
                fsutil.delete(spark, f"{base}/batch={i}")
            fsutil.delete(spark, old)
        fsutil.delete(spark, legacy_tmp)
        return
    tmp_rows = _count_or_none(spark, legacy_tmp)
    live_rows = _count_or_none(spark, target_live)
    if tmp_rows is not None and (live_rows is None or tmp_rows > live_rows):
        # tmp is the complete merged copy (step-2 tail or mid install
        # copy): install it with a committed overwrite write — recovery
        # itself is then crash-safe (an interrupted install leaves the
        # complete tmp in place for the re-run).
        spark.read.parquet(legacy_tmp).write.mode("overwrite").parquet(target_live)
    elif live_rows is None:
        # Neither copy readable — unreachable under the protocol
        # invariant (torn tmp ⇒ install completed ⇒ live complete);
        # defensively restore the pre-merge asides and bail.
        for old in olds:
            i = _batch_id(old)
            if not fsutil.exists(spark, f"{base}/batch={i}"):
                fsutil.rename(spark, old, f"{base}/batch={i}")
            else:
                fsutil.delete(spark, old)
        fsutil.delete(spark, legacy_tmp)
        return
    # else: live target holds >= the tmp's readable rows ⇒ the install
    # copy completed (step-3 delete phase) ⇒ live target is complete.
    # Drop the tmp's _SUCCESS marker first: a crash mid tmp-delete then
    # leaves a tmp that reads as partial (never more rows than the
    # installed live), so a recovery re-run lands back in live-wins.
    fsutil.delete(spark, f"{legacy_tmp}/_SUCCESS")
    fsutil.delete(spark, legacy_tmp)
    for old in olds:
        fsutil.delete(spark, old)


def _install_compacted(spark: SparkSession, base: str, plan: dict) -> None:
    """Idempotent rename-aside → install → cleanup from a journal plan.

    Precondition: ``compact_tmp`` under ``base`` holds the complete merged
    rows (the plan is only ever written after that write commits). Safe to
    re-run from any crash point — each step checks current state first.
    """
    from sheetreader_duckdb_spark.operators import fsutil

    tmp = f"{base}/compact_tmp"
    target = plan["target"]
    if not fsutil.exists(spark, tmp):
        # The tmp is deleted only AFTER the install write committed and
        # the asides were dropped — plan-present + tmp-gone means the
        # only step left is removing the journal. Without this check a
        # crash in that window would rename the fully-installed merged
        # directory aside and then fail reading the missing tmp.
        for i in plan["merged"]:
            fsutil.delete(spark, f"{base}/.batch={i}.old")
        fsutil.delete(spark, f"{base}/.compact.plan")
        return
    for i in plan["merged"]:
        live = f"{base}/batch={i}"
        aside = f"{base}/.batch={i}.old"
        if fsutil.exists(spark, live):
            # Under copy+delete rename semantics a mid-rename crash leaves
            # live complete and aside partial — live wins, retry the move.
            fsutil.delete(spark, aside)
            fsutil.rename(spark, live, aside)
    # Install is a fresh committed Spark write from the tmp (overwrite
    # replaces any partial attempt); completeness is the committer's
    # _SUCCESS semantics, not a directory rename — so a non-atomic
    # object-store rename can never leave a half-installed store that
    # looks live.
    (
        spark.read.parquet(tmp)
        .write.mode("overwrite")
        .parquet(f"{base}/batch={target}")
    )
    for i in plan["merged"]:
        fsutil.delete(spark, f"{base}/.batch={i}.old")
    fsutil.delete(spark, tmp)
    fsutil.delete(spark, f"{base}/.compact.plan")


def compact_corpus_state(
    spark: SparkSession,
    corpus_path: str,
    target_partitions: int | None = None,
) -> dict[str, int]:
    """Merge each state store's ``batch=<i>`` directories (LSM compaction).

    The builder's commit protocol appends one directory per micro-batch
    per store (the LSM-ish layout the module docstring describes); after
    thousands of batches the per-batch dedup pays a listing + many-small-
    files tax. Compaction merges every directory EXCEPT the newest into
    one named ``batch=<m>`` where ``m`` is the highest id merged — so a
    store compacts to two directories: the merged history and the newest
    batch, untouched.

    The newest batch is deliberately left out: Structured Streaming may
    redeliver the LAST batch after a crash (its state directories written,
    its checkpoint commit log not), and the redelivered batch dedups
    against digests of batches ``< batch_id`` only. Folding the newest
    batch's rows into a directory carrying its own id would hide ALL
    prior digests from that redelivery and break the idempotent
    accept-set guarantee; with ``m < top`` the merged history stays
    visible to it. Earlier batches cannot be redelivered (the stream
    commits batch N's log before starting N+1), so merging them is safe.
    ``docs/`` is never compacted: its per-batch directories are
    provenance.

    Crash-safe swap per store (single-writer — STOP the builder first; a
    concurrent accept_batch reading mid-swap could miss prior digests and
    accept a duplicate):

    1. write the merged rows to ``compact_tmp`` (committed Spark write);
    2. journal the intent: ``.compact.plan`` (atomic single-file publish)
       listing the merged ids and the target — the point of no return;
    3. rename the merged live directories aside to ``.batch=<i>.old``;
    4. install ``batch=<m>`` as a committed Spark write FROM the tmp (not
       a directory rename — object stores copy+delete renames are not
       atomic, a crashed install is detectable as a missing ``_SUCCESS``
       and simply re-run);
    5. delete the asides, the tmp, and the plan.

    A crash before step 2 rolls back (recover_corpus_state drops the
    tmp); from step 2 on, recovery ROLLS FORWARD by re-running steps 3-5
    from the journal — each step is idempotent. At every instant a
    complete copy of every row exists (live, tmp, or ``.old``).
    Returns {store: directories merged}.

    ``target_partitions`` sizes the merged write (default: one partition
    per ~8 input directories — at production scale pass an explicit value
    sized to ~128 MB output files).
    """
    import json

    from sheetreader_duckdb_spark.operators import fsutil

    recover_corpus_state(spark, corpus_path)
    merged_counts: dict[str, int] = {}
    for sub in _STATE_STORES:
        base = f"{corpus_path}/{sub}"
        dirs = fsutil.glob_dirs(spark, f"{base}/batch=*")
        top = max((_batch_id(d) for d in dirs), default=0)
        merge_dirs = [d for d in dirs if _batch_id(d) < top]
        if len(merge_dirs) <= 1:
            continue
        merged_ids = sorted(_batch_id(d) for d in merge_dirs)
        n_out = target_partitions or max(1, len(merge_dirs) // 8)
        tmp = f"{base}/compact_tmp"
        fsutil.delete(spark, tmp)
        (
            spark.read.parquet(*merge_dirs)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        plan = {"merged": merged_ids, "target": merged_ids[-1]}
        fsutil.write_text(spark, f"{base}/.compact.plan", json.dumps(plan))
        _install_compacted(spark, base, plan)
        merged_counts[sub] = len(merge_dirs)
    return merged_counts


def run_corpus_builder(
    spark: SparkSession,
    input_path: str,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema: str = "doc_id long, text string, lang string, source string, n_chars long",
    available_now: bool = True,
    near_dup: bool = False,
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    max_bucket_size: int | None = 1000,
    compact_every: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """Run the streaming builder over a directory of arriving parquet files.

    ``available_now=True`` drains everything currently present and stops —
    the testable/batch-drain mode; ``False`` runs continuously. The
    checkpoint makes batch ids stable across restarts, which is what the
    idempotent commit keys on. ``near_dup=True`` adds MinHash/LSH
    near-duplicate rejection on arrival (see accept_batch). State-store
    recovery (crashed compaction roll-forward/rollback) runs on entry, so
    a restart after any crash starts from a consistent layout.

    ``compact_every=N`` runs ``compact_corpus_state`` inline after every
    Nth committed batch. This is safe precisely because it runs INSIDE
    foreachBatch: the builder is the state stores' single writer, and no
    other batch can be mid-read. If the process dies after the compaction
    but before the stream commits the batch's log entry, the redelivered
    batch still sees the full history — compaction never touches the
    newest (its own) batch directory, and the merged directory keeps an
    id below it. Each compaction rewrites the accumulated history (one
    level, full merge) — at production scale pick N so the rewrite stays
    a small multiple of the inter-batch interval, or compact offline.
    ``max_files_per_trigger`` caps files per micro-batch (source option).
    """
    recover_corpus_state(spark, corpus_path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        accept_batch(
            df, batch_id, corpus_path, id_col, text_col,
            near_dup=near_dup, threshold=threshold,
            n_hashes=n_hashes, band_size=band_size, k=k,
            max_bucket_size=max_bucket_size,
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_corpus_state(spark, corpus_path)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
