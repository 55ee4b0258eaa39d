"""Vector similarity search over embedding columns (SURVEY.md §2.3 N3).

Baseline: brute-force cosine top-k — exact, one broadcast join (queries are
broadcast against the corpus, so the corpus never shuffles) + per-partition
top-k via window. The dot product is a JVM-side higher-order-function fold
(zip_with + aggregate) — no Python in the loop.

Scale path: sign-random-projection LSH. Each vector gets an ``n_planes``-bit
bucket from the signs of dot products with deterministic pseudo-random ±1
hyperplanes whose weights are sha256-derived constants, computed once on the
driver and embedded as literal arrays (Catalyst constant-folds them; the
executors do zero hashing per row). Candidates = same bucket (optionally
multi-probe neighbors at Hamming distance 1), exact cosine re-rank on
candidates only. At 100 TB: bucket join shuffles on the code, uniform by
construction; per-bucket populations concentrate ~N/2^bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in double, left-to-right fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is broadcast (assumed ≪ corpus); the corpus streams map-side —
    no corpus shuffle. The only shuffle is the final per-query top-k window,
    keyed by query id.
    """
    from pyspark.sql import Window

    # Norms are precomputed per vector (not per pair): the pairwise score is
    # then one fold + one divide. Same IEEE operations per pair → results
    # identical to inline cosine(), just O(n+q) norm folds instead of O(n·q).
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.join(broadcast(q), F.col("qid") != F.col("cid"))
        .select(
            "qid", "cid",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "cosine", "rn")
    )


def _srp_plane(p: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane weights: bits of sha256(plane, chunk).
    Computed once on the driver and embedded as an array literal — the
    executors do zero hashing per row (constant-folded by Catalyst)."""
    import hashlib

    out: list[float] = []
    chunk = 0
    while len(out) < dim:
        h = hashlib.sha256(f"srp:{p}:{chunk}".encode()).digest()
        for byte in h:
            for bit in range(8):
                out.append(1.0 if (byte >> bit) & 1 else -1.0)
                if len(out) == dim:
                    return out
        chunk += 1
    return out


def srp_planes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """The ±1 hyperplanes of one hash table. ``table`` offsets the plane
    seeds so independent tables get independent planes; table 0 preserves
    the original single-table plane sequence."""
    return [_srp_plane(table * 4096 + p, dim) for p in range(n_planes)]


def srp_code(vec_col: Column, dim: int, n_planes: int = 16, table: int = 0) -> Column:
    """Sign-random-projection bucket code (long). Plane weights are constant
    literal arrays (deterministic sha256-derived ±1), so the per-row cost is
    n_planes folds — same as n_planes dot products."""
    bits = []
    for p, weights in enumerate(srp_planes(dim, n_planes, table)):
        plane = F.array(*[F.lit(w) for w in weights])
        proj = F.aggregate(
            F.zip_with(vec_col, plane, lambda v, w: v.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * (1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 1,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket in ANY of
    ``n_tables`` independent hash tables; exact cosine re-rank on candidates.

    Recall = 1 - (1 - p^b)^L for per-plane agreement p, b planes, L tables;
    ``multi_probe`` additionally probes every Hamming-distance-1 bucket of
    each query (b extra probes per table — probes multiply the tiny query
    side only, never the corpus). The corpus emits L coded rows per vector
    (map-side explode); the join shuffles on (table, code), uniform by
    construction. tests/test_similarity.py pins recall@5 ≥ 0.9 vs the exact
    brute-force result at the n05b declared config."""
    from pyspark.sql import Window

    def coded(df: DataFrame, idc: str, vc: str, probe: bool) -> DataFrame:
        entries = []
        for t in range(n_tables):
            code = srp_code(F.col(vec_col), dim, n_planes, table=t)
            entries.append(F.struct(F.lit(t).alias("tbl"), code.alias("code")))
            if probe:
                entries.extend(
                    F.struct(F.lit(t).alias("tbl"), code.bitwiseXOR(F.lit(1 << p)).alias("code"))
                    for p in range(n_planes)
                )
        return df.select(
            F.col(id_col).alias(idc),
            F.col(vec_col).alias(vc),
            F.explode(F.array(*entries)).alias("tc"),
        ).select(idc, vc, F.col("tc.tbl").alias("tbl"), F.col("tc.code").alias("code"))

    q = coded(queries, "qid", "qv", probe=multi_probe)
    c = coded(corpus, "cid", "cv", probe=False)
    cands = (
        c.join(broadcast(q), on=["tbl", "code"])
        .filter(F.col("qid") != F.col("cid"))
        .dropDuplicates(["qid", "cid"])  # same pair can collide in many tables/probes
    )
    scored = cands.select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "cosine", "rn")
    )


def srp_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """Scale path for embedding near-dup: SRP-bucket equi-join + exact cosine
    ≥ threshold on in-bucket pairs only. The join shuffles on the bucket
    code (uniform by construction) — no cross product anywhere; compare
    ``embedding_neardup_pairs``, the O(n²) verification form this replaces
    at scale. Deterministic planes make the candidate set (and thus the
    result) exactly reproducible in SQL."""
    coded = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        srp_code(F.col(vec_col), dim, n_planes).alias("code"),
    )
    a = coded.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "code"
    )
    b = coded.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "code"
    )
    return (
        a.join(b, on="code")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All (a < b) pairs with cosine ≥ threshold. O(n²) scoring — the exact
    verification form; at scale run it on LSH candidates instead (see
    lsh_topk), which is the same plan with a bucket equi-join in front."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
