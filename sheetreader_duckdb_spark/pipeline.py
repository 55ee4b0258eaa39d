"""One-call training-corpus curation — the operator library composed in
the canonical order a production pipeline runs it:

    quality filter → exact dedup → near-dup cluster dedup →
    eval-set decontamination → sqrt-temperature source mixing →
    per-source token budget → sequence packing → sharded export

Every stage is one of the individually-oracle-witnessed operators; this
module adds only the composition and a per-stage row-count report.
Determinism is inherited: every keep/assign decision downstream of the
scan is a pure function of (seed, key), so the curated corpus — and the
exported shard bytes — are invariant to partitioning and cluster size.

Stage order rationale (the 100 TB budget): the scan-speed quality filter
runs FIRST so every shuffle downstream sees only surviving rows; exact
dedup (one digest shuffle) precedes near-dup so the LSH stages never
hash byte-identical copies; decontamination uses the benchmark-regime
join direction (the eval grams are the small distinct side); mixing and
budgeting are scan-speed predicates plus one bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sheetreader_duckdb_spark import session as SESS
from sheetreader_duckdb_spark.operators import dedup as D
from sheetreader_duckdb_spark.operators import sampling as SM
from sheetreader_duckdb_spark.operators import text as X

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    *,
    eval_df: DataFrame | None = None,
    quality_rules: dict | None = None,
    shingle_k: int = 3,
    n_hashes: int = 64,
    band_size: int = 8,
    jaccard_threshold: float = 0.8,
    contamination_k: int = 8,
    contamination_min_hits: int = 1,
    temperature: bool = True,
    budget_tokens: int | None = None,
    seed: str = "curate",
    collect_report: bool = True,
) -> tuple[DataFrame, list[tuple[str, int]]]:
    """Run the curation pipeline over ``df``; returns ``(curated, report)``
    where ``report`` is ``[(stage, surviving_rows), ...]`` (empty when
    ``collect_report=False`` — each report entry is one count job, which
    a fire-and-forget production run may not want to pay).

    ``eval_df`` (same schema) enables decontamination: corpus documents
    sharing ≥ ``contamination_min_hits`` word ``contamination_k``-grams
    with ANY eval document are dropped (the reverse join direction of
    ``operators.dedup.contamination``'s eval-flagging form — here the
    eval grams are the small distinct side, so the big side never
    builds a corpus-wide distinct).

    ``budget_tokens`` caps each source's whitespace-token mass, walking
    docs in deterministic hash order (no quality bias — a quality-ranked
    budget is one ``operators.sampling.budget_select`` call away).
    """
    report: list[tuple[str, int]] = []

    def note(stage: str, frame: DataFrame) -> DataFrame:
        # Each report count is an action; without a persist it would
        # re-execute the whole unpersisted upstream lineage, running the
        # expensive near-dup stages O(stages²) times across the report.
        # Persist every staged frame (the next stage AND its count read
        # the cache) through the deferred-release registry; a standalone
        # caller that wants the memory back immediately after
        # materializing the result should call session.release_deferred()
        # — the registry's documented contract.
        if collect_report:
            frame = SESS.defer_unpersist(frame.persist())
            report.append((stage, frame.count()))
        return frame

    cur = note("input", df)

    # 1. quality filter — scan speed, before anything shuffles.
    cur = note(
        "quality", cur.filter(X.quality_keep(F.col(text_col), quality_rules))
    )

    # 2. exact dedup — one digest shuffle.
    cur = note("exact_dedup", D.exact_dedup(cur, id_col, text_col))

    # 3. near-dup cluster dedup: shingles → MinHash → banded LSH →
    #    capped candidate pairs → exact Jaccard verify → one
    #    representative per connected cluster.
    sh = D.word_shingles(cur, id_col, text_col, k=shingle_k)
    sigs = D.minhash_signatures_xxhash(sh, id_col, n_hashes=n_hashes)
    bands = D.lsh_bands(sigs, id_col, n_hashes, band_size)
    cand = D.lsh_candidate_pairs(bands, id_col, max_bucket_size=1000)
    pairs = D.jaccard_verify(sh, cand, id_col, threshold=jaccard_threshold)
    cur = note("near_dedup", D.cluster_dedup_keep(cur, pairs, id_col))

    # 4. decontamination — drop corpus docs overlapping the eval set.
    if eval_df is not None:
        flagged = D.contamination(
            eval_df,
            cur,
            id_col,
            text_col,
            k=contamination_k,
            min_hits=contamination_min_hits,
        ).select(F.col("id").alias(id_col))
        cur = note("decontaminate", cur.join(flagged, id_col, "left_anti"))

    # 5. sqrt-temperature source mixing — integer-exact keep decision.
    if temperature:
        cur = note(
            "temperature_mix",
            SM.sqrt_temperature_sample(cur, source_col, id_col, seed=f"{seed}:t"),
        )

    # 6. per-source token budget — deterministic hash walk order.
    if budget_tokens is not None:
        cur = cur.withColumn("__nws", X.n_tokens(F.col(text_col)))
        cur = note(
            "budget",
            SM.budget_select(
                cur,
                [source_col],
                [F.md5(F.concat(F.lit(f"{seed}:b:"), F.col(id_col).cast("string"))), F.col(id_col)],
                "__nws",
                budget_tokens,
            ).drop("__nws"),
        )

    return cur, report
