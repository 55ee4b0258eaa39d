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


def srp_code(vec_col: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign-random-projection bucket code (long). Plane weights are constant
    literal arrays (deterministic sha256-derived ±1), so the per-row cost is
    n_planes folds — same as n_planes dot products."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _srp_plane(p, dim)])
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
) -> DataFrame:
    """Approximate top-k: candidates share the SRP bucket, exact cosine
    re-rank on candidates. Recall rises with fewer planes / multi-probe."""
    from pyspark.sql import Window

    code = lambda df, idc, vc: df.select(  # noqa: E731
        F.col(id_col).alias(idc), F.col(vec_col).alias(vc), srp_code(F.col(vec_col), dim, n_planes).alias("code")
    )
    q = code(queries, "qid", "qv")
    c = code(corpus, "cid", "cv")
    scored = (
        c.join(broadcast(q), on="code")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "cosine", "rn")
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
