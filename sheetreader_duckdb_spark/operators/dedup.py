"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §2.3 N1/N2): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All operators are pure DataFrame compositions — no Python UDFs in the hot
path, so every stage stays inside WholeStageCodegen and scales by
partitioning. Shuffle topology at 100 TB:

- exact: one hash-aggregate shuffle on the digest (map-side partial combine).
- minhash: explode(shingles) is map-side; the signature build is one shuffle
  keyed by (doc, seed) — or zero extra shuffles in the ``agg_signatures``
  form which folds all seeds in a single groupBy(doc). Band bucketing is a
  map-side projection; the candidate join shuffles by (band, band_key),
  which is uniformly distributed by construction (hash keys). Skewed buckets
  (giant near-dup clusters) are handled by AQE skew-join splitting.
- verification joins (jaccard) are self-joins on candidate pairs only —
  orders of magnitude smaller than the corpus.

Two hash flavors:
- ``xxhash64`` (JVM built-in, 64-bit ints) — the production/scale path.
- ``md5`` (hex strings) — the oracle-parity path: DuckDB has no xxhash64,
  so the queries() entries that must hash-match the oracle use md5. Same
  algorithm, different hash primitive; both deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# N1 — exact dedup
# --------------------------------------------------------------------------
def content_digest(col: Column | str) -> Column:
    """Deterministic content hash (hex md5) of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Group identical contents: (digest h, keep_id = min id, dupes = count).

    One shuffle on the digest; partial aggregation makes the map side emit
    one row per distinct digest per partition.
    """
    return df.groupBy(content_digest(content_col).alias("h")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dupes"),
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep exactly one row (the min id) per distinct content."""
    keep = exact_dedup_groups(df, id_col, content_col).select(F.col("keep_id").alias(id_col))
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# N2 — MinHash + LSH
# --------------------------------------------------------------------------
def gram_expr(n: int, arr: str = "_w") -> str:
    """SQL expression producing the array of space-joined word ``n``-grams
    of a token-array column ``arr`` — THE n-gram definition shared by every
    gram-based operator (shingles, repetition signals, substring-span
    dedup), so their gram spaces are provably identical."""
    return (
        f"transform(sequence(0, size({arr}) - {n}), i -> "
        + f"concat_ws(' ', {', '.join(f'{arr}[i + {j}]' for j in range(n))}))"
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-grams per document: (id, sh). Map-side explode; the
    DISTINCT is fused into downstream aggregation, no extra shuffle."""
    words = F.split(F.lower(F.col(text_col)), " ")
    return (
        df.select(F.col(id_col), words.alias("_w"))
        .filter(F.size("_w") >= k)
        .select(id_col, F.explode(F.expr(gram_expr(k))).alias("sh"))
        .distinct()
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = False,
    broadcast_train: bool = False,
) -> DataFrame:
    """Eval-set decontamination: eval documents sharing ≥ ``min_hits``
    word ``k``-grams with ANY training document.

    The check every LLM pipeline runs before trusting a benchmark number —
    a val/test document whose n-grams appear in train is contaminated (the
    model may have memorized it). Returns ``(id, n_hits, n_shingles,
    hit_ratio)`` per flagged eval doc.

    Scale shape: train shingles are reduced to DISTINCT grams (no doc ids —
    the membership set, typically ≪ corpus size), then one equi-join on the
    gram. Both sides shuffle on the shingle hash — uniform by construction;
    no per-doc state, no driver-side sets. For 100 TB train corpora, swap
    the string gram for ``xxhash64(sh)`` on BOTH sides before the join
    (integer shuffle keys, ~8 bytes/gram) — semantics identical modulo
    negligible 64-bit collisions.

    ``broadcast_eval=True`` is the 100 TB path when the eval set is the
    small side (benchmarks are thousands of docs, the corpus billions):
    the train grams are semi-joined against the BROADCAST distinct eval
    grams BEFORE their own distinct, so the corpus-wide gram shuffle —
    the default form's dominant cost — collapses to a map-side broadcast
    probe; only the matching residue (≤ the eval gram count) is
    distinct'd and joined. The result is EXACTLY the default form's
    (a semi join against the same membership set drops nothing the join
    would keep). Requires the distinct eval grams to fit the broadcast
    budget — the eval-benchmark regime this flag is named for.

    ``broadcast_train=True`` is the scale path for the REVERSED calling
    direction (decontaminating the corpus against a small benchmark:
    ``train`` = the eval set, ``eval_df`` = the corpus, as
    ``pipeline.curate_corpus`` does): the distinct TRAIN grams — here
    the small membership set — are broadcast into the hit join, so the
    corpus side's grams are probed map-side and never shuffle. Mutually
    exclusive with ``broadcast_eval`` (each names the regime where the
    OTHER side is the big one; enabling both would broadcast a
    corpus-sized set — the exact failure each flag exists to avoid).
    """
    if broadcast_eval and broadcast_train:
        raise ValueError(
            "broadcast_eval and broadcast_train are mutually exclusive: "
            "each assumes the opposite side is the small one"
        )
    ev = word_shingles(eval_df, id_col, text_col, k=k)
    tr_raw = word_shingles(train, id_col, text_col, k=k).select("sh")
    if broadcast_eval:
        tr = tr_raw.join(
            F.broadcast(ev.select("sh").distinct()), "sh", "left_semi"
        ).distinct()
    else:
        tr = tr_raw.distinct()
    if broadcast_train:
        tr = F.broadcast(tr)
    sizes = ev.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = ev.join(tr, "sh").groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        hits.filter(F.col("n_hits") >= min_hits)
        .join(sizes, id_col)
        .select(
            F.col(id_col).alias("id"),
            "n_hits",
            "n_shingles",
            (F.col("n_hits") / F.col("n_shingles")).alias("hit_ratio"),
        )
    )


def incremental_exact_dedup(
    new_df: DataFrame, id_col: str, content_col: str, existing_digests: DataFrame
) -> DataFrame:
    """Accept only new-batch rows that are novel: not identical to anything
    in the existing corpus (anti-join on the content digest) and exactly
    deduped within the batch (min id per digest).

    The incremental form every production corpus uses — each crawl batch
    dedups against the accepted corpus WITHOUT rereading it: the existing
    side is just its digest column (store it once, ~16 bytes/doc). Two
    digest-keyed shuffles, both on uniform hash keys; at 100 TB the digest
    table is a fraction of corpus size and the anti-join broadcasts or
    shuffles as AQE sees fit.

    ``existing_digests``: single-column DataFrame ``h`` (hex md5), e.g.
    ``exact_dedup_groups(corpus, ...).select("h")``.
    """
    withd = new_df.withColumn("__h", content_digest(content_col))
    novel = withd.join(
        existing_digests.select(F.col("h").alias("__h")), "__h", "left_anti"
    )
    keep = novel.groupBy("__h").agg(F.min(id_col).alias(id_col)).select(id_col)
    return new_df.join(keep, id_col, "left_semi")


def incremental_neardup_drop(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    existing_bands: DataFrame,
    existing_shingles: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    new_shingles: DataFrame | None = None,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Ids of new-batch docs that are near-duplicates of the EXISTING
    corpus: new docs' LSH bands equi-join the stored corpus bands, and the
    candidates verify with exact Jaccard against the stored corpus
    shingles.

    The existing corpus contributes only its precomputed (id, band,
    band_key) and (id, shingle) tables — built once when each batch is
    accepted, never recomputed. New-batch work is proportional to the
    batch, not the corpus: the band join shuffles on uniform hash keys,
    and the corpus shingle store is pruned to the CANDIDATE ids before
    any aggregate touches it (an unpruned per-id size count would shuffle
    every shingle ever stored on every batch).

    Callers that already derived the batch's shingle/band tables (e.g.
    the streaming corpus builder, which also writes them to its store)
    pass them via ``new_shingles``/``new_bands`` so the lineage is built
    once; both default to deriving from ``new_df``.
    """
    sh_new = (
        new_shingles
        if new_shingles is not None
        else word_shingles(new_df, id_col, text_col, k=k)
    )
    if new_bands is not None:
        bands_new = new_bands
    else:
        sigs = minhash_signatures_md5(sh_new, id_col, n_hashes=n_hashes)
        bands_new = lsh_bands(sigs, id_col, n_hashes=n_hashes, band_size=band_size)
    pairs = (
        bands_new.select(F.col(id_col).alias("id_b"), "band", "band_key")
        .join(
            existing_bands.select(F.col(id_col).alias("id_a"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact verification against the stored corpus shingles: same join
    # topology as jaccard_verify but the two sides come from different
    # tables (corpus = a, batch = b). The corpus side is candidate-pruned
    # FIRST — sizes and intersection both read only candidates' shingles.
    sa_pruned = existing_shingles.join(
        pairs.select(F.col("id_a").alias(id_col)).distinct(), id_col, "left_semi"
    )
    sizes_a = sa_pruned.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_a"))
    sizes_b = sh_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_b"))
    sa = sa_pruned.select(F.col(id_col).alias("id_a"), "sh")
    sb = sh_new.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    verified = (
        inter.join(sizes_a.select(F.col(id_col).alias("id_a"), "sz_a"), "id_a")
        .join(sizes_b.select(F.col(id_col).alias("id_b"), "sz_b"), "id_b")
        .filter(
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            >= threshold
        )
    )
    return verified.select(F.col("id_b").alias(id_col)).distinct()


def minhash_signatures_md5(shingles: DataFrame, id_col: str, n_hashes: int = 8) -> DataFrame:
    """Oracle-parity MinHash: per (doc, seed), min over md5(seed:shingle).

    Lexicographic min over hex digests ≡ min over a uniform hash. A single
    groupBy(doc) computes all seeds at once (one shuffle), each seed as an
    independent min aggregate.
    """
    # One py4j call per seed (r15 batch expression building): the Column
    # chain form cost ~6 round-trips per aggregate of pure driver
    # chatter; the parsed SQL is the identical expression tree
    # (concat/cast/md5/min over the same literals), so results and plans
    # are unchanged.
    aggs = [
        F.expr(f"min(md5(CAST(concat('{s}:', sh) AS BINARY))) AS mh{s}")
        for s in range(n_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_signatures_xxhash(shingles: DataFrame, id_col: str, n_hashes: int = 128) -> DataFrame:
    """Scale-path MinHash: 64-bit integer minima via xxhash64 (JVM, no string
    materialization). 128 hashes ≈ standard corpus-dedup setting."""
    # One py4j call per seed (r15 batch expression building — at the
    # production n_hashes=128 the Column-chain form alone cost ~0.7 s of
    # driver chatter per construction); identical expression, identical
    # results.
    aggs = [
        F.expr(f"min(xxhash64(sh, {s})) AS mh{s}") for s in range(n_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_bands(signatures: DataFrame, id_col: str, n_hashes: int, band_size: int) -> DataFrame:
    """(id, band, band_key): hash each band of the signature to a bucket key.
    Pure projection + explode — map-side only."""
    n_bands = n_hashes // band_size
    # Single-parse band array (r15 batch expression building): the
    # Column-chain form cost ~n_bands·band_size py4j round-trips; the SQL
    # string parses to the identical named_struct/md5/concat_ws tree
    # (F.struct over aliased columns IS named_struct), so band keys are
    # byte-identical.
    bands = F.expr(
        "array(" + ",".join(
            "named_struct('band', {b}, 'band_key', "
            "md5(CAST(concat_ws('|', {cols}) AS BINARY)))".format(
                b=b,
                cols=",".join(
                    f"CAST(mh{b * band_size + j} AS STRING)"
                    for j in range(band_size)
                ),
            )
            for b in range(n_bands)
        ) + ")"
    )
    return signatures.select(id_col, F.explode(bands).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def lsh_candidate_pairs(
    bands: DataFrame, id_col: str, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any band bucket.

    Bucket-grouped expansion instead of a self-join: one shuffle on
    (band, band_key), then in-bucket pair generation with array ops — the
    upstream shingle→minhash lineage is computed ONCE (a self-join would
    execute it twice, which dominates at corpus scale). Bucket membership
    lists are small by LSH design, but a pathological bucket (a giant
    near-dup cluster that survives exact dedup) makes both ``collect_set``
    and the O(size²) pair expansion unbounded. ``max_bucket_size`` caps
    that: bucket populations are counted FIRST (a cheap count aggregate —
    bounded memory regardless of skew) and oversized buckets are dropped
    before any membership list is materialized. Audit what was dropped with
    ``lsh_oversized_buckets`` (same cap ⇒ exactly the dropped set).
    """
    if max_bucket_size is not None:
        ok = (
            bands.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "band_key")
        )
        bands = bands.join(ok, ["band", "band_key"], "left_semi")
    buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_set(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    # Sorted ids ⇒ generated pairs already satisfy id_a < id_b.
    pair_expr = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def lsh_oversized_buckets(
    bands: DataFrame, id_col: str, max_bucket_size: int
) -> DataFrame:
    """(band, band_key, n_ids) of buckets a ``max_bucket_size`` cap drops —
    the audit trail for capped candidate generation. A production pipeline
    logs/persists this so dropped clusters are visible, not silent."""
    return (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .filter(F.col("n_ids") > max_bucket_size)
    )


def jaccard_verify(
    shingles: DataFrame, pairs: DataFrame, id_col: str, threshold: float = 0.0
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B|.

    Joins shingle sets only for candidates (tiny vs corpus). Counts are
    exact integers; the division is deterministic IEEE — oracle-safe.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a").join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# N2b — SimHash (16-bit oracle-parity variant; 64-bit xxhash64 scale variant)
# --------------------------------------------------------------------------
def simhash16_expr_sql(engine: str, token_col: str = "tok") -> str:
    """Build the 16-bit SimHash aggregate expression for either engine.

    Hash source: first 4 hex nibbles of md5(token); bit j of the signature is
    1 iff sum over tokens of (±1 by bit j) is positive. Both engines evaluate
    the identical integer arithmetic, so results hash-match.
    engine ∈ {'spark', 'duckdb'} — differs only in md5-binary-cast and shift
    syntax.
    """
    md5 = f"md5(cast({token_col} as binary))" if engine == "spark" else f"md5({token_col})"
    terms = []
    for j in range(16):
        p = j // 4 + 1  # hex char position 1..4, carrying 4 bits each
        shift = j % 4
        nib = f"(instr('0123456789abcdef', substr({md5}, {p}, 1)) - 1)"
        if engine == "spark":
            bit = f"(shiftright({nib}, {shift}) & 1)"
        else:
            bit = f"(({nib} >> {shift}) & 1)"
        sgn = f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END)"
        terms.append(f"(CASE WHEN {sgn} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def simhash16(tokens: DataFrame, id_col: str, token_col: str = "tok") -> DataFrame:
    """(id, simhash) over distinct tokens — one groupBy(doc) shuffle."""
    return tokens.groupBy(id_col).agg(
        F.expr(simhash16_expr_sql("spark", token_col)).alias("simhash")
    )


def simhash64_xxhash(tokens: DataFrame, id_col: str, token_col: str = "tok") -> DataFrame:
    """Scale-path 64-bit SimHash from xxhash64 bits (JVM-side)."""
    terms = []
    for j in range(64):
        bit = f"(shiftright(xxhash64({token_col}), {j}) & 1)"
        sgn = f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END)"
        terms.append(f"(CASE WHEN {sgn} > 0 THEN CAST({1 << j if j < 63 else -(1 << 63)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return tokens.groupBy(id_col).agg(F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)").alias("simhash"))


# --------------------------------------------------------------------------
# Near-dup cluster labels: connected components over the verified pair graph
# --------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Label each node of the near-dup pair graph with MIN(id) of its
    connected component: ``(node BIGINT, label BIGINT)``.

    Pairwise drop policies (keep min of each verified pair) under-merge
    transitive chains — A~B and B~C with A!~C must still collapse to one
    cluster, or the corpus keeps two of three near-identical documents.
    This is the step that turns a pair list into dedup clusters.

    Algorithm: hash-min label propagation with pointer halving. Each
    iteration every node takes the min label among (itself, its neighbors'
    labels, its label's label) — the last term is the pointer-jumping step
    that contracts label chains geometrically, so the fixpoint arrives in
    O(log diameter) rounds instead of O(diameter) (plain neighbor-min
    needs one round per hop on a path graph; the default ``max_iters=20``
    then covers astronomically long chains). Scale posture:

    - The input is the VERIFIED pair set — orders of magnitude smaller than
      the corpus (candidate generation already bucketed + capped upstream),
      so even at 100 TB corpus scale this graph is the small residue.
    - Each iteration is two node-keyed shuffles (neighbor min + label
      indirection), both uniform by construction; the driver sees only a
      converged/not-converged count.
    - Labels are lazily localCheckpoint()ed per iteration to cut lineage
      growth — iterative algorithms otherwise re-execute the whole chain
      each action — and the per-round convergence count doubles as the
      checkpoint's materializing action: one Spark job per iteration,
      not eager-checkpoint + count (VERDICT r7 task 5). The check stays
      PER-ROUND: batching it would trade a cheap count for a whole
      extra join iteration on the 1-3-round graphs dedup actually sees
      (measured +1.4 s on the composed pipeline — tried and reverted).
    - Near-dup graphs have tiny diameters (duplicate clusters are dense),
      so the loop exits after 2-3 iterations in practice; ``max_iters``
      bounds the pathological case, and hitting the bound raises rather
      than silently mislabeling.

    Non-SQL-expressible iteration count aside, the fixpoint itself is
    deterministic, and the DuckDB recursive-CTE transitive closure computes
    the identical labels — so the declared query form IS oracle-checkable.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        cand = labels.join(nbr_min, labels.node == nbr_min.src, "left").select(
            "node",
            F.col("label").alias("__old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # Pointer halving: follow the label one indirection (label's label)
        # and keep the min — contracts chains geometrically.
        ind = cand.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        # The pre-iteration label rides along as __old so convergence is a
        # filter+count over the checkpointed partitions — no extra shuffle
        # join against the previous labels per iteration.
        new_labels = (
            cand.join(ind, cand.label == ind.pnode, "left")
            .select(
                "node",
                "__old",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        labels = new_labels.select("node", "label")
        # The convergence count IS the materializing action for this
        # round's lazy checkpoint — one job per iteration, not the old
        # eager-checkpoint-then-count two. Checked EVERY round: near-dup
        # graphs converge in 1-3 rounds, so a batched check would trade
        # one cheap count for a whole extra join iteration (measured
        # +1.4 s on the curate pipeline's construct — reverted).
        changed = new_labels.filter(F.col("label") != F.col("__old")).count()
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations; "
        "the pair graph has a path longer than max_iters — raise max_iters "
        "or switch to large-star/small-star contraction for log-round "
        "convergence"
    )


def cluster_dedup_keep(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iters: int = 20
) -> DataFrame:
    """Cluster-aware keep-set: one representative (min id) per connected
    near-dup cluster, plus every unpaired row. Strictly stronger than the
    pairwise drop-id_b policy on transitive chains."""
    labels = connected_components(pairs, max_iters=max_iters)
    drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# SimHash near-dup pairs: pigeonhole band join + exact Hamming verify
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# N2f — cross-document repeated n-gram spans (exact substring dedup)
# --------------------------------------------------------------------------
#
# Document-level dedup (exact/MinHash/SimHash above) keeps one copy of a
# near-identical PAIR but does nothing about a boilerplate paragraph pasted
# into ten thousand otherwise-distinct pages. "Deduplicating Training Data
# Makes Language Models Better" (Lee et al. 2022) removes the repeated
# substrings themselves; this is the n-gram-granular form of that operator:
# find every word n-gram occurring in >= min_docs distinct documents, merge
# each document's hits into maximal token spans (interval union), and
# optionally cut those spans out of the text.
#
# Shuffle topology at 100 TB:
# - gram occurrence expansion is map-side (posexplode of a sequence);
# - the cross-corpus step is ONE hash-aggregate shuffle keyed by the gram
#   (count_distinct(doc) with partial aggregation — uniform keys, the same
#   shape as the MinHash band shuffle), followed by a semi join back that
#   shuffles on the same key and so reuses the partitioning;
# - everything after (island merge, coverage stats, span removal) is keyed
#   by doc id over the DUPLICATED residue only — orders of magnitude
#   smaller than the corpus.
# All stages are built-in expressions (WholeStageCodegen); the gram string
# itself can be replaced by xxhash64(gram) at scale to shrink shuffle width
# (the md5-free string form here is the oracle-parity path, like the
# MinHash md5/xxhash pair above).


def duplicate_ngram_occurrences(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Token positions of cross-document repeated word ``n``-grams:
    ``(id, pos)`` — the gram starting at token index ``pos`` (0-based, over
    ``split(lower(text), ' ')``) occurs in at least ``min_docs`` distinct
    documents. One corpus-wide shuffle (gram hash-aggregate + semi join on
    the same key); a position belongs to exactly one gram, so rows are
    unique by construction."""
    words = F.split(F.lower(F.col(text_col)), " ")
    grams = (
        df.select(F.col(id_col), words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(id_col, F.posexplode(F.expr(gram_expr(n))).alias("pos", "g"))
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    return grams.join(dup, "g", "left_semi").select(id_col, "pos")


def duplicate_ngram_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(id, span_start, span_end)`` with ``span_end`` exclusive — the union
    of the ``[pos, pos + n)`` intervals of duplicate_ngram_occurrences,
    merged when overlapping or adjacent (classic island detection: a
    running MAX of interval ends over a per-doc window, a new island
    whenever a gap appears). The window shuffle is keyed by doc id over
    the duplicated residue only."""
    from pyspark.sql.window import Window

    occ = duplicate_ngram_occurrences(df, id_col, text_col, n=n, min_docs=min_docs)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        occ.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
        )
        .drop("__island")
    )


def duplicate_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-affected-document summary of duplicated coverage:
    ``(id, n_spans, dup_tokens)`` — merged span count and total tokens
    covered by cross-document repeated n-grams. Documents with no
    duplicated gram produce no row. Pass precomputed ``spans``
    (duplicate_ngram_spans output, ideally persisted) when also running
    the removal pass — the corpus-wide gram shuffle then happens once."""
    if spans is None:
        spans = duplicate_ngram_spans(df, id_col, text_col, n=n, min_docs=min_docs)
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
    )


def remove_duplicate_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Cut every cross-document repeated n-gram span out of each document.

    Returns the input rows plus a ``scrub_text`` column: the document's
    tokens (canonical space — ``split(lower(text), ' ')``, single-space
    joined) with every covered token removed; a fully-covered document
    scrubs to ``''``. The original ``text_col`` is left untouched so
    callers keep provenance. Only affected documents (a span exists) pay
    the reconstruction joins — the unaffected majority takes the map-side
    canonical join only.

    The reconstruction is relational on purpose (posexplode tokens →
    anti-join covered positions → ordered re-agg): every step is a
    built-in expression over the duplicated residue, and the identical
    plan is expressible in ANSI SQL for the oracle twin. Pass precomputed
    ``spans`` (ideally persisted) when also computing stats — the
    corpus-wide gram shuffle then happens once.
    """
    words = F.split(F.lower(F.col(text_col)), " ")
    if spans is None:
        spans = duplicate_ngram_spans(df, id_col, text_col, n=n, min_docs=min_docs)
    covered = spans.select(
        id_col,
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("idx"),
    )
    affected = spans.select(id_col).distinct()
    toks = (
        df.join(affected, id_col, "left_semi")
        .select(F.col(id_col), F.posexplode(words).alias("idx", "tok"))
    )
    kept = toks.join(covered, [id_col, "idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("__scrub")
    )
    # A fully-covered doc keeps no token: rebuilt has no row, affected does
    # — coalesce to ''. Unaffected docs coalesce to their canonical join.
    scrubbed = affected.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col("__scrub"), F.lit("")).alias("__scrub")
    )
    return (
        df.join(scrubbed, id_col, "left")
        .withColumn(
            "scrub_text", F.coalesce(F.col("__scrub"), F.concat_ws(" ", words))
        )
        .drop("__scrub")
    )


def duplicate_line_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Line-level cross-document duplicates (the RefinedWeb / FineWeb
    line-dedup primitive): ``(id, ln, line_chars)`` — the 0-based line
    ``ln`` of ``split(text, '\\n')`` whose TRIMMED form occurs in at
    least ``min_docs`` distinct documents. Lines trimming to fewer than
    ``min_chars`` characters (default: blank lines) are never flagged.

    Matching is on the trimmed line; removal (below) drops the original
    line verbatim. One corpus-wide shuffle: trimmed-line hash-aggregate
    + semi join on the same key — the Lee-et-al gram-dedup topology, so
    the 100 TB posture is identical (uniform hash keys, duplicated
    residue only downstream)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "line"),
    ).withColumn("__norm", F.trim("line"))
    elig = lines.filter(F.length("__norm") >= min_chars)
    dup = (
        elig.groupBy("__norm")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__norm")
    )
    return elig.join(dup, "__norm", "left_semi").select(
        id_col, "ln", F.length("line").alias("line_chars")
    )


def duplicate_line_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 1,
    occurrences: DataFrame | None = None,
) -> DataFrame:
    """Per-affected-document summary: ``(id, dup_lines, dup_chars)`` —
    count of removed lines and their raw (untrimmed) character total.
    Documents with no duplicated line produce no row. Pass precomputed
    ``occurrences`` (ideally persisted) when also running the removal
    pass so the corpus-wide line shuffle happens once."""
    if occurrences is None:
        occurrences = duplicate_line_occurrences(
            df, id_col, text_col, min_docs=min_docs, min_chars=min_chars
        )
    return occurrences.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_lines"),
        F.sum("line_chars").alias("dup_chars"),
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 1,
    occurrences: DataFrame | None = None,
) -> DataFrame:
    """Remove every cross-document duplicated line from each document.

    Returns the input rows plus ``line_scrub_text``: the document's
    lines with every flagged line dropped, '\\n'-joined in original
    order. Unlike the token-level scrub, this is IDENTITY-preserving
    for unaffected documents (split + join on '\\n' is lossless), so
    ``line_scrub_text == text`` wherever nothing was removed; a
    fully-flagged document scrubs to ``''``. Only affected documents
    pay the reconstruction joins."""
    if occurrences is None:
        occurrences = duplicate_line_occurrences(
            df, id_col, text_col, min_docs=min_docs, min_chars=min_chars
        )
    occ = occurrences.select(id_col, "ln")
    affected = occ.select(id_col).distinct()
    lines = df.join(affected, id_col, "left_semi").select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "line"),
    )
    kept = lines.join(occ, [id_col, "ln"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ln", "line"))),
                lambda x: x["line"],
            ),
        ).alias("__scrub")
    )
    scrubbed = affected.join(rebuilt, id_col, "left").select(
        id_col, F.coalesce(F.col("__scrub"), F.lit("")).alias("__scrub")
    )
    return (
        df.join(scrubbed, id_col, "left")
        .withColumn(
            "line_scrub_text", F.coalesce(F.col("__scrub"), F.col(text_col))
        )
        .drop("__scrub")
    )


def simhash_pairs(
    signatures: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    n_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs from SimHash signatures:
    ``(id_a, id_b, hamming)`` with ``id_a < id_b`` and Hamming distance
    ≤ ``max_hamming``.

    Pigeonhole banding: the signature splits into ``max_hamming + 1``
    equal bit-bands — a pair differing in ≤ max_hamming bits must agree
    exactly on at least one band, so the candidate set (equi-join per
    (band index, band value), uniform hash keys) is a superset of every
    qualifying pair; ``bit_count(xor)`` then verifies exactly. This is
    what turns the signature operator (simhash16 / simhash64_xxhash) into
    a dedup method. At scale use 64-bit signatures: band width 16 gives
    ~N/65536 occupancy per band bucket; the 16-bit oracle-parity form has
    toy-sized bands (width 4) and exists for the DuckDB hash-match.
    ``n_bits`` must split evenly into max_hamming + 1 bands.
    """
    n_bands = max_hamming + 1
    if n_bits % n_bands:
        raise ValueError(
            f"n_bits={n_bits} must be divisible by max_hamming+1={n_bands} "
            "(equal-width pigeonhole bands)"
        )
    width = n_bits // n_bands
    mask = (1 << width) - 1
    sig = F.col(sig_col).cast("long")
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(sig, j * width).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for j in range(n_bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), sig.alias("__sig"), F.explode(bands).alias("b")
    ).select(id_col, "__sig", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("__sig").alias("sa"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("__sig").alias("sb"), "band", "val"
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
