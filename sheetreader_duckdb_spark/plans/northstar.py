"""North-star training-data-pipeline queries (SURVEY.md §2.3 N1–N5):
deduplication, similarity search, text analysis, multimodal columns.

Implementations live in ``sheetreader_duckdb_spark.operators``; each entry
here wires an operator over the testdata and pairs it with DuckDB oracle SQL
expressing the *same algorithm* (same hashes, same arithmetic), so results
hash-match. Where the production variant uses a hash DuckDB lacks
(xxhash64), the declared query uses the md5 flavor — identical topology,
different hash primitive (see operators/dedup.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark import functions as FN
from sheetreader_duckdb_spark.operators import dedup as D
from sheetreader_duckdb_spark.operators import fingerprint as FP
from sheetreader_duckdb_spark.operators import quality_model as QM
from sheetreader_duckdb_spark.operators import sampling as SM
from sheetreader_duckdb_spark.operators import retrieval as RT
from sheetreader_duckdb_spark.operators import similarity as S
from sheetreader_duckdb_spark.operators import web as WB
from sheetreader_duckdb_spark.operators import text as X
from sheetreader_duckdb_spark.plans import query
from sheetreader_duckdb_spark import session as SESS
from sheetreader_duckdb_spark.tables import T, parquet_row_count

# Shared DuckDB CTE fragments (document shingling / minhash / bands), kept in
# one place so the dedup family stays consistent.
def _sql_shingles(src: str = "documents") -> str:
    return _SQL_SHINGLES.replace("FROM documents", f"FROM {src}")


_SQL_SHINGLES = """
    words AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
              FROM words WHERE len(w) >= 3)
    )
"""

_SQL_MINHASH_BANDS = """
    seeds AS (SELECT unnest(range(8)) AS seed),
    mh AS (
        SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        FROM shingles CROSS JOIN seeds
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
        FROM mh GROUP BY doc_id, seed // 2
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (band, band_key)
        WHERE a.doc_id < b.doc_id
    )
"""


def _doc_shingles(spark: SparkSession, sf: str) -> DataFrame:
    return D.word_shingles(T(spark, sf, "documents"), "doc_id", "text", k=3)


def _minhash_pairs(sh: DataFrame) -> DataFrame:
    sigs = D.minhash_signatures_md5(sh, "doc_id", n_hashes=8)
    bands = D.lsh_bands(sigs, "doc_id", n_hashes=8, band_size=2)
    return D.lsh_candidate_pairs(bands, "doc_id")


def _sql_scrub_expr(text_sql: str = "text") -> str:
    """DuckDB chained regexp_replace mirroring scrub_pii — generated from the
    SAME SCRUB_PATTERNS list so Spark and oracle can never desync."""
    expr = text_sql
    for _name, pattern, token in X.SCRUB_PATTERNS:
        pat = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


# --------------------------------------------------------------------------
# N1 (+N2) — exact dedup groups AND the end-to-end dedup pipeline keep-set,
# plus the two corpus-lifecycle variants every production pipeline runs:
# incremental dedup of a new crawl batch against the accepted corpus
# (operators/dedup.py incremental_exact_dedup — batch-proportional work,
# corpus contributes only its stored digest table) and eval-set
# decontamination (operators/dedup.py contamination — eval docs sharing
# word k-grams with the train split). One tagged result:
#   'groups' = one hash-aggregate shuffle on the digest;
#   'kept'   = exact → MinHash/LSH → Jaccard → keep-set;
#   'incr'   = batch docs accepted against the corpus digest set (the batch
#              is the 'test' hash-split plus 5 re-crawled corpus copies, so
#              the drop path is exercised);
#   'contam' = eval docs flagged by train-gram overlap (n = hit count).
# --------------------------------------------------------------------------
_INC_SPLIT = [("train", 0.8), ("test", 0.2)]

# Deterministic train/val/test assignment shared by n07 (where the split
# column is witnessed) and the decontamination branch here.
_SPLIT_WEIGHTS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

# The n17 'bm25' query — four mid-frequency corpus terms; the tuple order
# fixes the summation order on both engines (operators/retrieval.py).
_BM25_TERMS = ("window", "stream", "hash", "spark")

# --- the composed-curation witness ('cur_*' tags, pipeline.curate_corpus) --
# Parameters shared by the Spark branch and the oracle twin: a 90/10
# corpus/eval hash split, a per-domain cap of 10, relaxed quality bounds
# (the synthetic texts carry few stopwords, so the stop_ratio rule is
# witnessed by n07 instead), the md5 MinHash flavor (8 hashes × 4 bands of
# 2, Jaccard ≥ 0.5 — n01's own dedup configuration), line + span scrubs,
# 8-gram decontamination, PII masking, sqrt-temperature, 500-token budget.
_CUR_SPLIT = [("corpus", 0.9), ("eval", 0.1)]
_CUR_RULES = {"n_ws_tokens": (30, 100_000), "mean_word_len": (2.0, 20.0)}
_CUR_DOMAIN_CAP = 10
_CUR_BUDGET = 500

_N01_ORACLE = f"""
    WITH RECURSIVE survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    docs2 AS (
        SELECT d.doc_id, d.text FROM documents d JOIN survivors s USING (doc_id)
    ),
    {_sql_shingles('docs2')},
    {_SQL_MINHASH_BANDS},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    neardup AS (
        SELECT DISTINCT i.id_b
        FROM inter i
        JOIN sizes za ON za.doc_id = i.id_a
        JOIN sizes zb ON zb.doc_id = i.id_b
        WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= 0.5
    ),
    inc_tagged AS (
        SELECT doc_id, text,
               {SM.split_case_sql("doc_id", _INC_SPLIT, seed="inc")} AS split
        FROM documents
    ),
    inc_corpus AS (SELECT doc_id, text FROM inc_tagged WHERE split = 'train'),
    inc_dupes AS (SELECT doc_id + 1000000 AS doc_id, text FROM
                  (SELECT doc_id, text FROM inc_corpus ORDER BY doc_id LIMIT 5)),
    inc_batch AS (SELECT doc_id, text FROM inc_tagged WHERE split = 'test'
                  UNION ALL SELECT * FROM inc_dupes),
    inc_existing AS (SELECT DISTINCT md5(text) AS h FROM inc_corpus),
    inc_novel AS (SELECT * FROM inc_batch
                  WHERE md5(text) NOT IN (SELECT h FROM inc_existing)),
    inc_keep AS (SELECT MIN(doc_id) AS doc_id FROM inc_novel GROUP BY md5(text)),
    cv_tagged AS (
        SELECT doc_id, text,
               {SM.split_case_sql("doc_id", _SPLIT_WEIGHTS, seed="corpus-v1")} AS split
        FROM documents
    ),
    ctr_sh AS (
        SELECT DISTINCT w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT w, unnest(range(len(w) - 2)) AS i
              FROM (SELECT string_split(lower(text), ' ') AS w
                    FROM cv_tagged WHERE split = 'train')
              WHERE len(w) >= 3)
    ),
    cev_sh AS (
        SELECT DISTINCT doc_id, w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM cv_tagged WHERE split != 'train')
              WHERE len(w) >= 3)
    ),
    contam_hits AS (
        SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM cev_sh e JOIN ctr_sh t USING (sh) GROUP BY e.doc_id
    ),
    -- ---- 'cur_kept': the COMPOSED curation pipeline (pipeline.curate_corpus,
    -- md5 flavor) — every stage's individually-witnessed SQL twin chained in
    -- the FineWeb/RefinedWeb order over a derived corpus (per-source header +
    -- inline email + shared footer decoration, synthesized per-source domains,
    -- 5 planted exact duplicates, 90/10 corpus/eval hash split).
    cur_dec AS (
        SELECT doc_id, source,
               '== ' || source || ' ==' || chr(10) || text || ' mail admin@'
               || source || '.com' || chr(10) || 'shared footer boilerplate' AS text
        FROM documents
    ),
    cur_corpus AS MATERIALIZED (
        SELECT doc_id, source, text FROM cur_dec
        WHERE ({SM.split_case_sql("doc_id", _CUR_SPLIT, seed="cur")}) = 'corpus'
    ),
    cur_eval AS MATERIALIZED (
        SELECT doc_id, text FROM cur_dec
        WHERE ({SM.split_case_sql("doc_id", _CUR_SPLIT, seed="cur")}) = 'eval'
    ),
    cur_in AS MATERIALIZED (
        SELECT doc_id, source, text,
               'https://WWW.' || source || '.COM/d/' || doc_id
               || '?utm_source=t&x=1' AS url
        FROM (SELECT doc_id, source, text FROM cur_corpus
              UNION ALL
              SELECT doc_id + 2000000 AS doc_id, source, text FROM
                  (SELECT doc_id, source, text FROM cur_corpus
                   ORDER BY doc_id LIMIT 5))
    ),
    cur_s1 AS MATERIALIZED (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   row_number() OVER (
                       PARTITION BY {WB.registrable_domain_sql(WB.url_host_sql('url'))}
                       ORDER BY md5(({WB.normalize_url_sql('url')})
                                    || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM cur_in)
        WHERE rk <= {_CUR_DOMAIN_CAP}
    ),
    cur_s2 AS MATERIALIZED (SELECT * FROM cur_s1 WHERE {X.quality_keep_sql('text', _CUR_RULES)}),
    cur_s3 AS MATERIALIZED (
        SELECT s.* FROM cur_s2 s
        JOIN (SELECT MIN(doc_id) AS doc_id FROM cur_s2 GROUP BY md5(text)) k
        USING (doc_id)
    ),
    cur_ll AS MATERIALIZED (
        SELECT doc_id, i AS ln, ls[i + 1] AS line
        FROM (SELECT doc_id, ls, unnest(range(len(ls))) AS i
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM cur_s3))
    ),
    cur_ldup AS MATERIALIZED (
        SELECT trim(line) AS t FROM cur_ll WHERE len(trim(line)) >= 1
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    cur_s4 AS MATERIALIZED (
        SELECT s.doc_id, s.source, COALESCE(r.t2, '') AS text
        FROM cur_s3 s
        LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS t2
                   FROM cur_ll
                   WHERE NOT (len(trim(line)) >= 1
                              AND trim(line) IN (SELECT t FROM cur_ldup))
                   GROUP BY doc_id) r USING (doc_id)
        WHERE len(COALESCE(r.t2, '')) > 0
    ),
    cur_w AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS w FROM cur_s4),
    cur_sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3] AS sh
        FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
              FROM cur_w WHERE len(w) >= 3)
    ),
    cur_mh AS MATERIALIZED (
        SELECT doc_id, seed, min(md5(seed || ':' || sh)) AS mh
        FROM cur_sh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    cur_bands AS MATERIALIZED (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
        FROM cur_mh GROUP BY doc_id, seed // 2
    ),
    cur_cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM cur_bands a JOIN cur_bands b USING (band, band_key)
        WHERE a.doc_id < b.doc_id
    ),
    cur_sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM cur_sh GROUP BY doc_id),
    cur_inter AS MATERIALIZED (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
        FROM cur_cand p
        JOIN cur_sh sa ON sa.doc_id = p.id_a
        JOIN cur_sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    cur_ver AS MATERIALIZED (
        SELECT i.id_a, i.id_b
        FROM cur_inter i
        JOIN cur_sizes za ON za.doc_id = i.id_a
        JOIN cur_sizes zb ON zb.doc_id = i.id_b
        WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= 0.5
    ),
    cur_edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM cur_ver
        UNION
        SELECT id_b AS src, id_a AS dst FROM cur_ver
    ),
    cur_nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM cur_edges),
    cur_reach(node, r) AS (
        SELECT node, node FROM cur_nodes
        UNION
        SELECT cur_reach.node, e.dst
        FROM cur_reach JOIN cur_edges e ON e.src = cur_reach.r
    ),
    cur_cc AS MATERIALIZED (SELECT node, MIN(r) AS label FROM cur_reach GROUP BY node),
    cur_s5 AS MATERIALIZED (
        SELECT * FROM cur_s4
        WHERE doc_id NOT IN (SELECT node FROM cur_cc WHERE node <> label)
    ),
    cur_dw AS MATERIALIZED (SELECT doc_id, string_split(lower(text), ' ') AS w FROM cur_s5),
    cur_dg AS MATERIALIZED (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(w, i + 1, i + 5), ' ') AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 4)) AS i
              FROM cur_dw WHERE len(w) >= 5)
    ),
    cur_docc AS MATERIALIZED (
        SELECT doc_id, pos FROM cur_dg
        WHERE g IN (SELECT g FROM cur_dg GROUP BY g
                    HAVING COUNT(DISTINCT doc_id) >= 2)
    ),
    cur_disl AS MATERIALIZED (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos,
                     MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS prev_end
              FROM cur_docc)
    ),
    cur_dspan AS MATERIALIZED (
        SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 5 AS e
        FROM cur_disl GROUP BY doc_id, island
    ),
    cur_dtok AS MATERIALIZED (
        SELECT doc_id, i AS idx, w[i + 1] AS tok
        FROM (SELECT doc_id, w, unnest(range(len(w))) AS i FROM cur_dw)
    ),
    cur_s6 AS MATERIALIZED (
        SELECT s.doc_id, s.source, COALESCE(r.t2, '') AS text
        FROM cur_s5 s
        LEFT JOIN (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.idx) AS t2
                   FROM cur_dtok t
                   WHERE NOT EXISTS (SELECT 1 FROM cur_dspan sp
                                     WHERE sp.doc_id = t.doc_id
                                       AND t.idx >= sp.s AND t.idx < sp.e)
                   GROUP BY t.doc_id) r USING (doc_id)
        WHERE len(COALESCE(r.t2, '')) > 0
    ),
    cur_ev8 AS MATERIALIZED (
        SELECT DISTINCT array_to_string(list_slice(w, i + 1, i + 8), ' ') AS sh
        FROM (SELECT w, unnest(range(len(w) - 7)) AS i
              FROM (SELECT string_split(lower(text), ' ') AS w FROM cur_eval)
              WHERE len(w) >= 8)
    ),
    cur_s7 AS MATERIALIZED (
        SELECT * FROM cur_s6 WHERE doc_id NOT IN (
            SELECT DISTINCT c.doc_id FROM (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(w, i + 1, i + 8), ' ') AS sh
                FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS i
                      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                            FROM cur_s6)
                      WHERE len(w) >= 8)
            ) c JOIN cur_ev8 USING (sh))
    ),
    cur_s8 AS MATERIALIZED (
        SELECT doc_id, source, {_sql_scrub_expr('text')} AS text FROM cur_s7
    ),
    cur_tc AS MATERIALIZED (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS tn FROM cur_s8 GROUP BY source
    ),
    cur_s9 AS MATERIALIZED (
        SELECT s.doc_id, s.source, s.text
        FROM cur_s8 s JOIN cur_tc c USING (source)
        WHERE {SM.temperature_predicate_sql('s.doc_id', 'c.tn', '(SELECT MIN(tn) FROM cur_tc)', seed='cur:t')}
    ),
    cur_s10 AS MATERIALIZED (
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
                       PARTITION BY source
                       ORDER BY md5('cur:b:' || CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM cur_s9)
        WHERE cum <= {_CUR_BUDGET}
    )
    SELECT 'groups' AS tag, md5(text) AS h, MIN(doc_id) AS id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents GROUP BY md5(text)
    UNION ALL
    SELECT 'kept' AS tag, CAST(NULL AS VARCHAR) AS h, doc_id AS id,
           CAST(NULL AS BIGINT) AS n
    FROM survivors
    WHERE doc_id NOT IN (SELECT id_b FROM neardup)
    UNION ALL
    SELECT 'incr' AS tag, CAST(NULL AS VARCHAR) AS h, doc_id AS id,
           CAST(NULL AS BIGINT) AS n
    FROM inc_keep
    UNION ALL
    SELECT 'contam' AS tag, CAST(NULL AS VARCHAR) AS h, doc_id AS id,
           n_hits AS n
    FROM contam_hits
    UNION ALL
    SELECT 'cur_kept' AS tag, md5(text) AS h, doc_id AS id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM cur_s10
    """


@query(
    "n01_dedup_exact_pipeline",
    oracle=_N01_ORACLE,
    doc="Exact content dedup groups ('groups': digest, keep id, dupe count — "
    "one hash-aggregate shuffle with map-side partials, N1) plus the "
    "end-to-end pipeline keep-set ('kept': exact dedup keeps the min doc "
    "per digest, MinHash+LSH proposes candidates among survivors, exact "
    "Jaccard ≥0.5 verifies, the higher id of each verified pair drops — "
    "the canonical training-corpus flow, N1→N2); plus the corpus-lifecycle "
    "forms: 'incr' = incremental_exact_dedup of a new crawl batch (test "
    "hash-split + 5 re-crawled corpus copies) against the accepted corpus' "
    "stored digest table (batch-proportional work — the corpus is never "
    "re-read), and 'contam' = eval-set decontamination (eval docs sharing "
    "word 3-grams with the train split; distinct-gram build side, one "
    "uniform shingle-join shuffle); plus 'cur_kept' = the COMPOSED one-call "
    "curation pipeline (pipeline.curate_corpus, md5 MinHash flavor) run "
    "end-to-end over a derived corpus (per-source header + inline email + "
    "shared footer decoration, synthesized per-source domains, 5 planted "
    "exact duplicates, 90/10 corpus/eval hash split): per-domain cap 10 → "
    "Gopher quality bounds → exact dedup → line-level cross-doc dedup → "
    "MinHash/LSH cluster dedup (8×md5, 4 bands of 2, Jaccard ≥0.5) → "
    "repeated-5-gram span scrub → 8-gram eval decontamination "
    "(broadcast_train direction) → PII masking → sqrt-temperature mixing → "
    "500-token per-source budget. h = md5 of each surviving document's "
    "final text and n its token count, so membership, every stage's "
    "rewrite, and the budget walk are all pinned byte-for-byte against "
    "the DuckDB twin of the same ten-stage composition.",
)
def n01_dedup_exact_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    return n01_dedup_core(spark, sf).unionAll(n01_cur_kept_branch(spark, sf))


def n01_dedup_core(spark: SparkSession, sf: str) -> DataFrame:
    # The dedup-lifecycle branches (groups/kept/incr/contam) WITHOUT the
    # composed-curation witness — standalone so bench.py can time the
    # dedup core comparably across rounds while the declared query keeps
    # the full five-branch union (VERDICT r7 task 4).
    docs = T(spark, sf, "documents")
    g = D.exact_dedup_groups(docs.select("doc_id", "text"), "doc_id", "text")
    groups = g.select(
        F.lit("groups").alias("tag"),
        "h",
        F.col("keep_id").alias("id"),
        F.col("dupes").alias("n"),
    )
    # survivors derived from the SAME digest aggregate as 'groups' (r14,
    # guide §2.4): exact_dedup() used to build its own copy, whose pruned
    # partial aggregate (no dupes count) made the digest exchange
    # non-identical to the groups branch's — two full md5 scans. The
    # always-true dupes >= 1 filter (dupes is a count, >= 1 by
    # construction, but the optimizer cannot prove it) keeps the count in
    # this branch's aggregate too, so both subtrees stay byte-identical
    # and the digest shuffle stage is computed once (AQE stage reuse).
    # Result-identical: the filter drops nothing.
    keep = g.filter(F.col("dupes") >= 1).select(F.col("keep_id").alias("doc_id"))
    survivors = docs.select("doc_id", "text").join(keep, "doc_id", "left_semi")
    # Persist the shared shingle set: its explode+distinct shuffle feeds the
    # signature build AND the Jaccard verification joins, and column pruning
    # defeats ReuseExchange across those branches (see n03). Deferred
    # release: dropped when the next declared query is constructed, so the
    # cache never outlives its consumer in a 50-query corpus run.
    sh = SESS.defer_unpersist(
        D.word_shingles(survivors, "doc_id", "text", k=3).persist()
    )
    sigs = D.minhash_signatures_md5(sh, "doc_id", n_hashes=8)
    bands = D.lsh_bands(sigs, "doc_id", n_hashes=8, band_size=2)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    verified = D.jaccard_verify(sh, pairs, "doc_id", threshold=0.5)
    drop = verified.select(F.col("id_b").alias("doc_id")).distinct()
    kept = (
        survivors.select("doc_id")
        .join(drop, "doc_id", "left_anti")
        .select(
            F.lit("kept").alias("tag"),
            F.lit(None).cast("string").alias("h"),
            F.col("doc_id").alias("id"),
            F.lit(None).cast("long").alias("n"),
        )
    )
    # 'incr' — incremental dedup of a synthetic crawl batch (the 'test'
    # hash-split plus 5 re-crawled corpus copies) against the accepted
    # corpus' stored digests. The corpus side contributes ONLY its digest
    # column — batch-proportional work, the production incremental shape.
    d_inc = docs.withColumn("split", SM.hash_split("doc_id", _INC_SPLIT, seed="inc"))
    inc_corpus = d_inc.filter(F.col("split") == "train").select("doc_id", "text")
    inc_dupes = (
        inc_corpus.orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    inc_batch = (
        d_inc.filter(F.col("split") == "test").select("doc_id", "text").unionAll(inc_dupes)
    )
    inc_digests = D.exact_dedup_groups(inc_corpus, "doc_id", "text").select("h")
    incr = D.incremental_exact_dedup(inc_batch, "doc_id", "text", inc_digests).select(
        F.lit("incr").alias("tag"),
        F.lit(None).cast("string").alias("h"),
        F.col("doc_id").alias("id"),
        F.lit(None).cast("long").alias("n"),
    )
    # 'contam' — eval-set decontamination over the corpus-v1 hash-split
    # (the same split n07 witnesses): eval docs sharing any word 3-gram
    # with the train side; n carries the hit count.
    d_v1 = docs.withColumn(
        "split", SM.hash_split("doc_id", _SPLIT_WEIGHTS, seed="corpus-v1")
    )
    contam = D.contamination(
        d_v1.filter(F.col("split") == "train"),
        d_v1.filter(F.col("split") != "train"),
        "doc_id",
        "text",
        k=3,
        # the scale form (pre-distinct broadcast semi join) — result-
        # identical to the default by construction, so the oracle is
        # unchanged and the driver witnesses the production path.
        broadcast_eval=True,
    ).select(
        F.lit("contam").alias("tag"),
        F.lit(None).cast("string").alias("h"),
        F.col("id"),
        F.col("n_hits").alias("n"),
    )
    return groups.unionAll(kept).unionAll(incr).unionAll(contam)


def n01_cur_kept_branch(spark: SparkSession, sf: str) -> DataFrame:
    # 'cur_kept' — the composed curation pipeline, end-to-end: the exact
    # curate_corpus call a production run makes (md5 MinHash flavor so the
    # DuckDB twin hash-matches), over a derived corpus that makes every
    # stage non-trivial: header/footer decoration feeds line dedup, an
    # inline per-source email feeds the PII scrub, per-source domains make
    # the cap-10 bind, 5 planted copies exercise exact dedup, and the
    # held-out 'eval' hash split drives decontamination.
    #
    # A standalone callable (not just an n01 branch) so bench.py can time
    # the curation witness separately from n01's dedup core — the 50-row
    # CORRECTNESS cap forces the declared union, but attributing the
    # composed pipeline's fixed construct cost to the dedup query made
    # n01's number incomparable across rounds (VERDICT r7 task 4).
    from sheetreader_duckdb_spark import pipeline as PIPE

    docs = T(spark, sf, "documents")
    decorated = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("== "),
            F.col("source"),
            F.lit(" ==\n"),
            F.col("text"),
            F.lit(" mail admin@"),
            F.col("source"),
            F.lit(".com\nshared footer boilerplate"),
        ).alias("text"),
    ).withColumn("split", SM.hash_split("doc_id", _CUR_SPLIT, seed="cur"))
    cur_corpus = decorated.filter(F.col("split") == "corpus").select(
        "doc_id", "source", "text"
    )
    cur_eval = decorated.filter(F.col("split") == "eval").select("doc_id", "text")
    planted = (
        cur_corpus.orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "source", "text")
    )
    cur_in = cur_corpus.unionAll(planted).withColumn(
        "url",
        F.concat(
            F.lit("https://WWW."),
            F.col("source"),
            F.lit(".COM/d/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=t&x=1"),
        ),
    )
    curated, _ = PIPE.curate_corpus(
        cur_in,
        "doc_id",
        "text",
        "source",
        eval_df=cur_eval,
        quality_rules=_CUR_RULES,
        url_col="url",
        domain_cap=_CUR_DOMAIN_CAP,
        shingle_k=3,
        n_hashes=8,
        band_size=2,
        jaccard_threshold=0.5,
        minhash="md5",
        line_dedup=True,
        dupspan=True,
        pii=True,
        contamination_k=8,
        budget_tokens=_CUR_BUDGET,
        seed="cur",
        collect_report=False,
    )
    return curated.select(
        F.lit("cur_kept").alias("tag"),
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.col("doc_id").alias("id"),
        X.n_tokens(F.col("text")).alias("n"),
    )


# --------------------------------------------------------------------------
# N2 — MinHash + LSH candidate pairs
# --------------------------------------------------------------------------
@query(
    "n02_dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_MINHASH_BANDS}
    SELECT id_a, id_b FROM pairs
    """,
    doc="MinHash(8 md5 hashes) + LSH(4 bands × 2) candidate pairs over word "
    "3-gram shingles (N2). Production variant uses 128×xxhash64 — same plan.",
)
def n02_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return _minhash_pairs(_doc_shingles(spark, sf))


# --------------------------------------------------------------------------
# N2b — production-scale MinHash variant (128 × xxhash64, 64-bit integer
# minima, no string materialization). xxhash64 has no DuckDB equivalent →
# rows-only check; the algorithm's topology is oracle-proven by n02.
# --------------------------------------------------------------------------
# Declared via nx_scale_variants (50-row CORRECTNESS cap). Doc:
_N02B_DOC = ("Scale-path MinHash+LSH: 128 xxhash64 signatures, 16 bands × 8 — the "
    "standard corpus-dedup setting; JVM integer hashing end-to-end (N2). "
    "Bucket size capped at 1000 (counted before any membership list is "
    "built), so one pathological cluster cannot OOM the pair expansion; "
    "dropped buckets are auditable via lsh_oversized_buckets."
)


def n02b_dedup_minhash_xxhash(spark: SparkSession, sf: str) -> DataFrame:
    sh = _doc_shingles(spark, sf)
    sigs = D.minhash_signatures_xxhash(sh, "doc_id", n_hashes=128)
    bands = D.lsh_bands(sigs, "doc_id", n_hashes=128, band_size=8)
    return D.lsh_candidate_pairs(bands, "doc_id", max_bucket_size=1000)


# --------------------------------------------------------------------------
# N2c — exact n-gram Jaccard verification of the candidates
# --------------------------------------------------------------------------
@query(
    "n03_dedup_jaccard_verify",
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_MINHASH_BANDS},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           i.n_inter / (za.sz + zb.sz - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
    WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= 0.5
    """,
    doc="Exact shingle-set Jaccard on LSH candidates (verification pass, N2). "
    "Integer counts + deterministic division → oracle-exact.",
)
def n03_dedup_jaccard_verify(spark: SparkSession, sf: str) -> DataFrame:
    # The shingle set feeds four consumers (signatures, sizes, both sides of
    # the intersection join); column pruning makes the subplans
    # non-identical so Spark's ReuseExchange cannot kick in — persist the
    # narrow (id, shingle) projection once instead of recomputing the
    # explode+distinct shuffle per branch. At production scale this would
    # be a checkpoint; memory-and-disk persist has the same effect here.
    # Deferred release: the cache lives while the lazy result is consumed
    # and is dropped when the next declared query is constructed.
    sh = SESS.defer_unpersist(_doc_shingles(spark, sf).persist())
    pairs = _minhash_pairs(sh)
    return D.jaccard_verify(sh, pairs, "doc_id", threshold=0.5)


# --------------------------------------------------------------------------
# N2d — SimHash signatures
# --------------------------------------------------------------------------
@query(
    "n04_dedup_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    sigs AS (
        SELECT doc_id, {D.simhash16_expr_sql('duckdb')} AS simhash
        FROM toks GROUP BY doc_id
    ),
    banded AS (
        SELECT doc_id, simhash, j AS band, (simhash >> (j * 8)) & 255 AS val
        FROM sigs CROSS JOIN (SELECT unnest(range(2)) AS j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM banded a JOIN banded b USING (band, val)
        WHERE a.doc_id < b.doc_id
    )
    SELECT 'sig' AS tag, doc_id AS a, simhash AS b, CAST(NULL AS BIGINT) AS h
    FROM sigs
    UNION ALL
    SELECT 'pair' AS tag, id_a, id_b, hamming
    FROM (SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
          FROM cand)
    WHERE hamming <= 1
    """,
    doc="SimHash dedup (N2), two tagged branches: 'sig' = 16-bit md5-nibble "
    "signatures over distinct unigrams; 'pair' = near-dup pairs via "
    "operators/dedup.py simhash_pairs — pigeonhole banding (hamming <= 1 "
    "=> 2 bands of 8 bits; a qualifying pair agrees exactly on >= 1 band), "
    "band equi-join on uniform keys, exact bit_count(xor) verify. The "
    "16-bit signature space is the oracle-parity toy; the production form "
    "is the same plan over simhash64_xxhash (64-bit, band width 16, "
    "~N/65536 bucket occupancy — see nx_scale_variants 'sim64').",
)
def n04_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).distinct()
    sigs = D.simhash16(toks, "doc_id")
    nil = F.lit(None).cast("long")
    sig_b = sigs.select(
        F.lit("sig").alias("tag"),
        F.col("doc_id").alias("a"),
        F.col("simhash").cast("long").alias("b"),
        nil.alias("h"),
    )
    pair_b = D.simhash_pairs(sigs, "doc_id", n_bits=16, max_hamming=1).select(
        F.lit("pair").alias("tag"),
        F.col("id_a").alias("a"),
        F.col("id_b").alias("b"),
        F.col("hamming").alias("h"),
    )
    return sig_b.unionAll(pair_b)


# --------------------------------------------------------------------------
# N2e — production-scale 64-bit SimHash (xxhash64 bits; rows-only)
# --------------------------------------------------------------------------
# Declared via nx_scale_variants (50-row CORRECTNESS cap).
_N04B_DOC = (
    "Scale-path SimHash: 64-bit signatures from xxhash64 bit votes over "
    "distinct unigrams (N2); the 16-bit md5 variant n04 carries the oracle."
)


def n04b_dedup_simhash64(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).distinct()
    return D.simhash64_xxhash(toks, "doc_id")


# --------------------------------------------------------------------------
# N3 — brute-force cosine top-k (exact ANN baseline)
# --------------------------------------------------------------------------
_SQL_COSINE = """
        list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))) /
        (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) *
         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
"""


def _sql_n05_bf() -> str:
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
    s AS (
        SELECT qid, cid, {_SQL_COSINE} AS cosine
        FROM q CROSS JOIN c WHERE qid <> cid
    )
    SELECT 'bf' AS tag, qid, cid, cosine AS score, CAST(rn AS BIGINT) AS rn
    FROM (SELECT qid, cid, cosine,
                 row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
          FROM s)
    WHERE rn <= 5
    """


# --------------------------------------------------------------------------
# N3b — SRP-LSH approximate top-k (no DuckDB oracle: same-bucket candidate
# generation is Spark-side xxhash64; driver records rows-only)
# --------------------------------------------------------------------------
# Declared via nx_scale_variants (50-row CORRECTNESS cap). Doc:
_N05B_DOC = ("Approximate-NN family (scale paths for N3), four tagged branches "
    "over the same (qid, cid, cosine, rn) shape: 'lsh' = "
    "sign-random-projection LSH top-k (16 independent 6-plane tables + "
    "Hamming-1 multi-probe on the query side, exact cosine re-rank); "
    "'ivf' = inverted-file ANN (hash-strata-seeded Lloyd centroids, cell "
    "equi-join, n_probe=4 of 16 cells); 'q8' = int8-quantized two-stage "
    "search (exact integer coarse cosine on 4x-smaller vectors, float "
    "rescoring of k*refine candidates); 'pq' = product quantization + ADC "
    "(Jégou et al. 2011 — 16 per-subspace codebooks trained in one "
    "aggregate per Lloyd iteration, corpus stored as 16 small code ids = "
    "16x compression, query-side lookup-table scoring, exact float "
    "rescoring); 'ivfpq' = the two composed — IVFADC (Jégou et al. 2011 "
    "§V, shared-codebook non-residual form): the index relation is "
    "(cell, 16 code ids), the coarse ADC pass touches only the n_probe=8 "
    "of 16 probed cells via a cell equi-join, exact float rescore of the "
    "survivors — the genuine 100 TB serving shape (candidate bytes ~ "
    "n_probe/n_cells x m/dim/4 of the raw corpus). Rows-only check "
    "(approximate candidate sets are not SQL-reproducible; n06b carries "
    "the SRP-bucket oracle); tests/test_similarity.py + tests/test_pq.py "
    "pin recall vs the exact n05 result for all five (lsh >= 0.9 measured "
    "0.96; ivf and q8 >= 0.9; pq >= 0.9 measured 1.0 at m=16, refine=16; "
    "ivfpq >= 0.7 at half-probe on the worst-case Gaussian testdata, plus "
    "a full-probe bit-identity pin to the 'pq' branch)."
)


def n05b_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    lsh_b = S.lsh_topk(
        e, q, dim=64, k=5, n_planes=6, n_tables=16, multi_probe=True
    ).select(F.lit("lsh").alias("tag"), "qid", "cid", "cosine", "rn")
    ivf_b = S.ivf_topk(e, q, k=5, n_cells=16, n_probe=4).select(
        F.lit("ivf").alias("tag"), "qid", "cid", "cosine", "rn"
    )
    q8_b = S.quantized_topk(e, q, k=5, refine=4).select(
        F.lit("q8").alias("tag"), "qid", "cid", "cosine", "rn"
    )
    books = S.pq_codebooks(e, dim=64, m=16, n_codes=16, n_iters=2)
    # broadcast-table form (pq_topk_join): bit-identical to pq_topk
    # (test-pinned) with plan size constant in the book size
    pq_b = S.pq_topk_join(e, q, books, k=5, refine=16).select(
        F.lit("pq").alias("tag"), "qid", "cid", "cosine", "rn"
    )
    # composed IVF+PQ (IVFADC): coarse cell pruning over the m-code
    # relation, half-probe config — the branch that exercises BOTH scale
    # levers at once (codebooks shared with the 'pq' branch).
    ivfpq_b = S.ivfpq_topk(
        e, q, k=5, n_cells=16, n_probe=8, refine=16, codebooks=books
    ).select(F.lit("ivfpq").alias("tag"), "qid", "cid", "cosine", "rn")
    return lsh_b.unionAll(ivf_b).unionAll(q8_b).unionAll(pq_b).unionAll(ivfpq_b)


# --------------------------------------------------------------------------
# N3c — embedding-cosine near-dup pairs
# --------------------------------------------------------------------------
@query(
    "n06_embedding_neardup",
    oracle=f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS qv FROM embeddings),
    b AS (SELECT vec_id AS id_b, embedding AS cv FROM embeddings)
    SELECT id_a, id_b, {_SQL_COSINE} AS cosine
    FROM a CROSS JOIN b
    WHERE id_a < id_b AND {_SQL_COSINE} >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.4 — testdata max "
    "cosine ≈0.51). Exact O(n²) verification form — the small-sf cross-check "
    "for n06b, which is the production (SRP-bucketed) variant.",
)
def n06_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    return S.embedding_neardup_pairs(T(spark, sf, "embeddings"), threshold=0.4)


# --------------------------------------------------------------------------
# N3c-production — SRP-bucketed near-dup: candidates share a deterministic
# sign-random-projection bucket (equi-join on the code — NO cross product),
# then exact cosine ≥ threshold. The planes are sha256-derived ±1 literals,
# so the oracle reproduces the identical bucketing in SQL.
# --------------------------------------------------------------------------
def _sql_srp_code(vec_expr: str, dim: int, n_planes: int) -> str:
    from sheetreader_duckdb_spark.operators.similarity import srp_planes

    terms = []
    for p, w in enumerate(srp_planes(dim, n_planes)):
        lit = "[" + ", ".join(("1.0" if x > 0 else "-1.0") for x in w) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), i -> "
            f"CAST({vec_expr}[i] AS DOUBLE) * ({lit})[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@query(
    "n06b_embedding_neardup_srp",
    # The oracle mirrors auto_srp_planes EXACTLY rather than hardcoding a
    # plane count: plane p's bit is weighted 2^p and the plane sequence is
    # fixed, so the p-plane code is the 16-plane code mod 2^p — the SQL
    # computes the full 16-plane code (auto_srp_planes' hi clamp) and masks
    # by the same least(16, greatest(6, round(log2(n/8)))) rule, making the
    # oracle valid at EVERY corpus size, not just the 500-vector sf where
    # 6 planes happen to match. (round() ties — DuckDB half-up vs Python
    # banker's — would need log2(n/8) to be exactly k+0.5, impossible for
    # integer n since 2^(k+1/2) is irrational.)
    oracle=f"""
    WITH np AS (
        SELECT CAST(least(16, greatest(6, round(log2(count(*) / 8.0))))
                    AS BIGINT) AS p
        FROM embeddings
    ),
    coded AS (
        SELECT vec_id, embedding AS v,
               {_sql_srp_code('embedding', 64, 16)}
                 % CAST(pow(2, (SELECT p FROM np)) AS BIGINT) AS code
        FROM embeddings
    ),
    a AS (SELECT vec_id AS id_a, v AS qv, code FROM coded),
    b AS (SELECT vec_id AS id_b, v AS cv, code FROM coded)
    SELECT id_a, id_b, {_SQL_COSINE} AS cosine
    FROM a JOIN b USING (code)
    WHERE id_a < id_b AND {_SQL_COSINE} >= 0.4
    """,
    doc="Production embedding near-dup (N3): SRP-bucket equi-join + exact "
    "cosine ≥ 0.4 on in-bucket pairs. The plane count is auto-sized to the "
    "corpus (auto_srp_planes: ≈log2(n/8), clamped to [6, 16]), and the "
    "oracle derives the SAME count from count(*) and masks a 16-plane "
    "code, so Spark and oracle agree at every sf. "
    "The plan shuffles on the bucket code — no "
    "BroadcastNestedLoopJoin, and candidate pairs scale as n²/2^planes: "
    "n_planes ≈ log2(n / target_bucket) keeps bucket population flat, and "
    "recover recall with multi-table hashing (srp_neardup_pairs n_tables; "
    "recall quantified in tests/test_similarity.py — planted near-dups "
    "≥0.9 at 6 planes × 8 tables, the hard 0.4-threshold regime ≥0.9 at "
    "4 × 12). n06 is the O(n²) exact cross-check of this query's "
    "candidate pruning.",
)
def n06b_embedding_neardup_srp(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    # Size the bucketing to the corpus: bigger corpora get more planes so
    # expected bucket population — and with it the in-bucket pair volume
    # — stays constant instead of growing linearly with n. The count
    # comes from parquet FOOTER metadata on the driver (r13: no eager
    # Spark job at plan-build time), and equals count(*) exactly, so the
    # oracle's count(*)-derived plane count can't desync at any sf.
    n_planes = S.auto_srp_planes(
        parquet_row_count(sf, "embeddings"), target_bucket=8, lo=6
    )
    return S.srp_neardup_pairs(e, dim=64, n_planes=n_planes, threshold=0.4)


# --------------------------------------------------------------------------
# N3c-witness — PQ + ADC with integer-exact coarse arithmetic, so the
# product-quantization pipeline graduates from rows-only to hash-checked:
# the oracle rebuilds the SAME codebooks from the data (int-quantized
# sub-vectors of vec_id < n_codes), re-derives the integer argmin
# encoding and LUT scores in BIGINT, and rescored cosines reuse the
# hash-green n05 form. Constants mirrored on both sides:
_PQ_W = {"dim": 64, "m": 8, "n_codes": 16, "k": 5, "refine": 4, "scale": 128}


def _sql_pq_adc() -> str:
    d, m, nc, k, rf, sc = (
        _PQ_W["dim"], _PQ_W["m"], _PQ_W["n_codes"],
        _PQ_W["k"], _PQ_W["refine"], _PQ_W["scale"],
    )
    ds = d // m
    return f"""
    WITH iv AS (
        SELECT vec_id,
               list_transform(range(1, {d + 1}),
                   i -> CAST(round(CAST(embedding[i] AS DOUBLE) * {sc}) AS BIGINT)) AS v,
               embedding AS fv
        FROM embeddings
    ),
    books AS (SELECT vec_id AS code, v FROM iv WHERE vec_id < {nc}),
    subs AS (SELECT unnest(range({m})) AS j),
    dists AS (
        SELECT c.vec_id AS cid, s.j, b.code,
               list_sum(list_transform(range(1, {ds + 1}), p ->
                   (c.v[s.j * {ds} + p] - b.v[s.j * {ds} + p])
                 * (c.v[s.j * {ds} + p] - b.v[s.j * {ds} + p]))) AS dd
        FROM iv c CROSS JOIN subs s CROSS JOIN books b
    ),
    codes AS (
        SELECT cid, j, code FROM (
            SELECT cid, j, code,
                   row_number() OVER (PARTITION BY cid, j ORDER BY dd, code) AS r
            FROM dists
        ) WHERE r = 1
    ),
    adc AS (
        SELECT q.vec_id AS qid, co.cid,
               SUM(list_sum(list_transform(range(1, {ds + 1}), p ->
                   q.v[co.j * {ds} + p] * b.v[co.j * {ds} + p]))) AS coarse
        FROM iv q
        CROSS JOIN codes co
        JOIN books b ON co.code = b.code
        WHERE q.vec_id < 10 AND q.vec_id <> co.cid
        GROUP BY q.vec_id, co.cid
    ),
    cand AS (
        SELECT qid, cid, coarse,
               row_number() OVER (PARTITION BY qid ORDER BY coarse DESC, cid) AS crn
        FROM adc
    ),
    survivors AS (SELECT qid, cid, coarse, crn FROM cand WHERE crn <= {k * rf}),
    resc AS (
        SELECT s.qid, s.cid,
               list_sum(list_transform(range(1, {d + 1}),
                   i -> CAST(q.fv[i] AS DOUBLE) * CAST(c.fv[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, {d + 1}),
                   i -> CAST(q.fv[i] AS DOUBLE) * CAST(q.fv[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, {d + 1}),
                   i -> CAST(c.fv[i] AS DOUBLE) * CAST(c.fv[i] AS DOUBLE))))) AS cos
        FROM survivors s
        JOIN iv q ON q.vec_id = s.qid
        JOIN iv c ON c.vec_id = s.cid
    )
    SELECT 'pq_coarse' AS tag, qid, cid, CAST(coarse AS DOUBLE) AS score,
           CAST(crn AS BIGINT) AS rn
    FROM survivors
    UNION ALL
    SELECT 'pq_final', qid, cid, cos, CAST(rn AS BIGINT)
    FROM (SELECT qid, cid, cos,
                 row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
          FROM resc)
    WHERE rn <= {k}
    """


@query(
    "n05_ann_bruteforce_topk",
    oracle=(
        "SELECT * FROM (" + _sql_n05_bf() + ")\n"
        "    UNION ALL\n"
        "    SELECT * FROM (" + _sql_pq_adc() + ")"
    ),
    doc="ANN search, three tagged branches over (tag, qid, cid, score, "
    "rn), ALL hash-checked: 'bf' = exact top-5 cosine neighbors for 10 "
    "query vectors (broadcast queries, JVM fold dot products, per-query "
    "top-k window — the N3 exact baseline); 'pq_coarse'/'pq_final' = "
    "product quantization + ADC top-k, hash-checked end to end (Jégou "
    "et al. 2011 — the witness form of the Lloyd-trained "
    "operators/similarity.py pq_codebooks/pq_topk path, whose recall "
    "tests/test_pq.py pins): vectors int-quantize exactly (round(v·128) "
    "as BIGINT), subspace codebooks are the int sub-vectors of corpus "
    "rows vec_id < 16 — data-derived AND SQL-reproducible — encoding is "
    "an exact integer L2 argmin, the ADC coarse score an exact integer "
    "LUT sum ('pq_coarse': engine-bit-identical survivor ranks), and "
    "the k·refine survivors rescore with the exact float cosine "
    "('pq_final': the hash-green bf form). Scale shape matches pq_topk: "
    "only m-int codes shuffle through the ranking window; float vectors "
    "are fetched for the broadcast survivor residue only. The "
    "approximate scale family (lsh/ivf/q8/float-pq) is nx_scale_variants.",
)
def n05_ann_bruteforce_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    qset = e.filter(F.col("vec_id") < 10)
    bf = S.brute_force_topk(e, qset, k=5).select(
        F.lit("bf").alias("tag"),
        "qid",
        "cid",
        F.col("cosine").alias("score"),
        "rn",
    )
    pq = S.pq_adc_exact(
        e,
        qset,
        dim=_PQ_W["dim"],
        m=_PQ_W["m"],
        n_codes=_PQ_W["n_codes"],
        k=_PQ_W["k"],
        refine=_PQ_W["refine"],
        scale=_PQ_W["scale"],
    ).withColumn("tag", F.concat(F.lit("pq_"), F.col("tag")))
    return bf.unionAll(pq)


# --------------------------------------------------------------------------
# N4 — text analysis signals: quality + language-ID + fingerprint, one
# scan-speed per-document projection (no shuffle anywhere)
# --------------------------------------------------------------------------
def _sql_lang_score(lang: str) -> str:
    parts = [
        f"CAST((length(text) - length(replace(text, '{m}', ''))) / {len(m)} AS BIGINT)"
        for m in X.LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


# Frozen linear quality model (operators/quality_model.py) for the n07
# witness: rational features only (stop/punct ratios, mean word len) are
# bit-identical across engines, but the margin's multiply-add chain may
# FMA-contract in DuckDB (1-ulp drift) — the hash witness is therefore
# the floor-quantized integer margin. Training itself (pyspark.ml LBFGS)
# and the sigmoid scoring path are pinned in tests/test_quality_model.py;
# the declared corpus witnesses the codegen'd inference expression with
# these frozen weights.
_MLQ_MODEL = {
    "features": ["stop_ratio", "punct_ratio", "mean_word_len"],
    "weights": [10.0, -8.0, 0.35],
    "intercept": -4.0,
}

# Frozen BPE merge table for the n07 tokenizer witness (operators/bpe.py):
# fit once with bpe_train(word_counts(documents), n_merges=24) on the
# sf0.01 corpus — the quality_model pattern: TRAINING is pinned against
# the pure-Python reference in tests/test_bpe.py, the declared corpus
# witnesses ENCODING under these frozen merges, which compiles to a chain
# of built-in replaces on both engines (generated from this one list, so
# Spark and oracle can never desync).
_BPE_MERGES = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
]


def _sql_text_signals() -> str:
    from sheetreader_duckdb_spark.operators import bpe as BP

    langs = list(X.LANG_MARKERS)
    mlq_q_sql = QM.margin_quantized_sql(
        _MLQ_MODEL, QM.quality_feature_sqls("text", "n_chars")
    )
    bpe_n_sql = BP.bpe_token_count_sql("text", _BPE_MERGES)
    bpe_fp_sql = f"md5({BP.bpe_encode_sql('text', _BPE_MERGES)})"
    stop_set = ", ".join(f"'{w}'" for w in X.STOPWORDS)
    scores = ", ".join(f"{_sql_lang_score(lg)} AS s_{lg}" for lg in langs)
    greatest = f"greatest({', '.join('s_' + lg for lg in langs)})"
    case = "CASE " + " ".join(f"WHEN s_{lg} = m THEN '{lg}'" for lg in langs) + " END"
    return rf"""
    WITH scored AS (SELECT doc_id, lang, text, n_chars, {scores} FROM documents),
    m AS (SELECT *, {greatest} AS m FROM scored)
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{X.BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) - length(regexp_replace(text, '{X.PUNCT_CLASS}', '', 'g')) AS BIGINT) AS n_punct,
           CAST(len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ({stop_set}))) AS BIGINT) AS n_stop,
           CAST(len(list_filter(string_split(lower(text), ' '),
                    x -> x IN ({stop_set}))) AS BIGINT)
             / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio,
           CAST(length(text) - length(regexp_replace(text, '{X.PUNCT_CLASS}', '', 'g')) AS BIGINT)
             / n_chars AS punct_ratio,
           {", ".join('s_' + lg for lg in langs)},
           {case} AS pred_lang,
           ({case}) = lang AS is_match,
           md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
           substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 8) AS fp8,
           {SM.split_case_sql('doc_id', _SPLIT_WEIGHTS, seed='corpus-v1')} AS split,
           {X.quality_keep_sql('text')} AS keep,
           {mlq_q_sql} AS mlq_margin_q,
           ({mlq_q_sql} >= 0) AS mlq_keep,
           md5({_sql_scrub_expr('text')}) AS scrub_fp,
           {bpe_n_sql} AS bpe_vocab_tokens,
           {bpe_fp_sql} AS bpe_enc_fp
    FROM m
    """


@query(
    "n07_text_signals",
    oracle=_sql_text_signals(),
    doc="Per-document text analysis (N4), one wide projection: quality "
    "signals (whitespace + BPE-ish token counts, punctuation and stopword "
    "counts/ratios), marker-count language-ID with deterministic argmax "
    "tiebreak + agreement with the labeled lang, the md5 content "
    "fingerprint of whitespace-normalized lowercased text, and the "
    "deterministic 80/10/10 train/val/test hash-split assignment "
    "(operators/sampling.py), the Gopher-style quality keep decision "
    "(operators/text.py QUALITY_RULES), the model-based quality filter's "
    "inference path (operators/quality_model.py: mlq_margin_q = frozen "
    "linear model over rational signals as ONE codegen'd expression, "
    "floor-quantized to 1e-6 because DuckDB may FMA-contract the "
    "multiply-add chain; mlq_keep = mlq_margin_q >= 0, derived from the "
    "SAME quantized witness on both engines so a margin within 1 ulp of "
    "zero cannot flip the boolean between engines — training via "
    "pyspark.ml LBFGS and sigmoid parity pinned in "
    "tests/test_quality_model.py), "
    "and the PII-scrub witness "
    "(scrub_fp = md5 of scrub_pii(text) — pins every masked byte of the "
    "URL/email/phone scrub without shipping the text), plus the BPE "
    "tokenizer witness (operators/bpe.py: bpe_vocab_tokens = token count "
    "and bpe_enc_fp = md5 of the full encoding under the frozen 24-merge "
    "table _BPE_MERGES — encoding is a chain of built-in replaces over "
    "the spaced-symbol representation, generated from the same merge "
    "list on both engines; merge FITTING is the one-shuffle word_counts "
    "+ bounded driver loop, pinned vs the pure-Python reference in "
    "tests/test_bpe.py). Scan-speed column expressions, zero shuffles.",
)
def n07_text_signals(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators import bpe as BP

    d = T(spark, sf, "documents")
    text = F.col("text")
    mlq_q = QM.margin_quantized_expr(
        _MLQ_MODEL, QM.quality_feature_exprs(text, F.col("n_chars"))
    )
    n_ws = X.n_tokens(text)
    n_stop = X.stopword_hits(text)
    n_punct = X.punct_count(text)
    scores = X.lang_scores(text)
    pred = X.predict_lang(text)
    fp = X.fingerprint(text)
    return d.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        X.bpe_token_count(text).alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        (n_stop / n_ws).alias("stop_ratio"),
        (n_punct / F.col("n_chars")).alias("punct_ratio"),
        *[scores[lg].alias(f"s_{lg}") for lg in X.LANG_MARKERS],
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_match"),
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("fp8"),
        SM.hash_split("doc_id", _SPLIT_WEIGHTS, seed="corpus-v1").alias("split"),
        X.quality_keep(text).alias("keep"),
        mlq_q.alias("mlq_margin_q"),
        (mlq_q >= 0).alias("mlq_keep"),
        F.md5(X.scrub_pii(text).cast("binary")).alias("scrub_fp"),
        BP.bpe_token_count_expr(text, _BPE_MERGES).alias("bpe_vocab_tokens"),
        F.md5(BP.bpe_encode_expr(text, _BPE_MERGES).cast("binary")).alias(
            "bpe_enc_fp"
        ),
    )


# --------------------------------------------------------------------------
# N4d — corpus token statistics per source, plus the dataset-assembly
# operators that act on those stats: deterministic sampling (Bernoulli /
# exact-stratified / source mixing, operators/sampling.py), the salted
# two-phase aggregation (operators/skew.py), and the Gopher repetition
# signals (operators/text.py). Tagged branches share the schema
# (tag, source, n_docs, ws_tokens, bpe_tokens, chars, id_sum); id_sum =
# SUM(doc_id) pins exact row MEMBERSHIP of each sample/filter, not just its
# size — two different keep-sets of equal count cannot hash-match.
# --------------------------------------------------------------------------
_MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
_REP_THRESHOLD = 0.1  # dup_gram_frac cut — flags ~20% of the synthetic corpus
_BUDGET_TOKENS = 2000  # per-source token allowance — partial at every test sf


@query(
    "n10_token_stats",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id, source, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '{X.BPE_TOKEN_PATTERN}')) AS BIGINT) AS bpe
        FROM documents
    ),
    grams AS (
        SELECT doc_id, w[i + 1] || ' ' || w[i + 2] AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM documents)
              WHERE len(w) >= 2)
    ),
    per_gram AS (
        SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM grams GROUP BY doc_id, g
    ),
    rep AS (
        SELECT doc_id,
               SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c) AS dup_gram_frac
        FROM per_gram GROUP BY doc_id
    ),
    dw AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    dg AS (
        SELECT doc_id, i AS pos, array_to_string(list_slice(w, i + 1, i + 5), ' ') AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 4)) AS i
              FROM dw WHERE len(w) >= 5)
    ),
    ddup AS (SELECT g FROM dg GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    docc AS (SELECT doc_id, pos FROM dg WHERE g IN (SELECT g FROM ddup)),
    disl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos,
                     MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
              FROM docc)
    ),
    dspan AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 5 AS e
        FROM disl GROUP BY doc_id, island
    ),
    dup_stats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(e - s) AS BIGINT) AS dup_tokens
        FROM dspan GROUP BY doc_id
    ),
    dtok AS (
        SELECT doc_id, i AS idx, w[i + 1] AS tok
        FROM (SELECT doc_id, w, unnest(range(len(w))) AS i FROM dw)
        WHERE doc_id IN (SELECT doc_id FROM dup_stats)
    ),
    dkept AS (
        SELECT t.doc_id, t.idx, t.tok FROM dtok t
        WHERE NOT EXISTS (SELECT 1 FROM dspan sp
                          WHERE sp.doc_id = t.doc_id
                            AND t.idx >= sp.s AND t.idx < sp.e)
    ),
    dup_scrub AS (
        SELECT a.doc_id,
               CAST(('0x' || substr(md5(COALESCE(r.scrub, '')), 1, 8)) AS BIGINT) AS fp
        FROM (SELECT DISTINCT doc_id FROM dup_stats) a
        LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS scrub
                   FROM dkept GROUP BY doc_id) r USING (doc_id)
    ),
    lld AS (
        SELECT doc_id, source,
               '== section ' || source || ' ==' || chr(10) || text || chr(10)
               || 'shared footer boilerplate' AS ltext
        FROM documents
    ),
    ll AS (
        SELECT doc_id, source, i AS ln, ls[i + 1] AS line
        FROM (SELECT doc_id, source, ls, unnest(range(len(ls))) AS i
              FROM (SELECT doc_id, source, string_split(ltext, chr(10)) AS ls
                    FROM lld))
    ),
    ldupn AS (
        SELECT trim(line) AS t FROM ll WHERE len(trim(line)) >= 1
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    locc AS (
        SELECT doc_id, ln, len(line) AS line_chars FROM ll
        WHERE len(trim(line)) >= 1 AND trim(line) IN (SELECT t FROM ldupn)
    ),
    lstats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_lines,
               CAST(SUM(line_chars) AS BIGINT) AS dup_chars
        FROM locc GROUP BY doc_id
    ),
    lkept AS (
        SELECT l.doc_id, l.ln, l.line FROM ll l
        WHERE l.doc_id IN (SELECT doc_id FROM lstats)
          AND NOT EXISTS (SELECT 1 FROM locc o
                          WHERE o.doc_id = l.doc_id AND o.ln = l.ln)
    ),
    lscrub AS (
        SELECT a.doc_id,
               CAST(('0x' || substr(md5(COALESCE(r.s, '')), 1, 8)) AS BIGINT) AS fp
        FROM (SELECT DISTINCT doc_id FROM lstats) a
        LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS s
                   FROM lkept GROUP BY doc_id) r USING (doc_id)
    ),
    udf AS (
        SELECT doc_id, source,
               'https://WWW.' || source ||
               (CASE WHEN doc_id % 2 = 0 THEN '.CO.UK' ELSE '.Example.COM' END)
               || '/Docs/' || doc_id || '?utm_source=x&ref=' || (doc_id % 7)
               || '&b=2&a=1#s' AS url
        FROM documents
    ),
    uurl AS (
        SELECT doc_id, source,
               {WB.normalize_url_sql('url')} AS nurl,
               {WB.registrable_domain_sql(WB.url_host_sql('url'))} AS dom
        FROM udf
    ),
    ukept AS (
        SELECT doc_id, source, nurl, dom,
               row_number() OVER (
                   PARTITION BY dom
                   ORDER BY md5(nurl || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM uurl
    )
    SELECT 'all' AS tag, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM sig GROUP BY source
    UNION ALL
    SELECT 'salted', source, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(ws) AS BIGINT), CAST(SUM(bpe) AS BIGINT),
           CAST(SUM(n_chars) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM sig GROUP BY source
    UNION ALL
    SELECT 'sample', source, CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE {{sample_pred}}
    GROUP BY source
    UNION ALL
    SELECT 'strat', source, CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('s1:' || doc_id), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    GROUP BY source
    UNION ALL
    SELECT 'mix', source, CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE {{mix_pred}}
    GROUP BY source
    UNION ALL
    SELECT 'rep', CAST(NULL AS VARCHAR), CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM rep WHERE dup_gram_frac >= {_REP_THRESHOLD}
    UNION ALL
    SELECT 'chunk', source, CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(len(substring(text, ord * 400 + 1, 500))) AS BIGINT),
           CAST(SUM(doc_id + ord) AS BIGINT)
    FROM (
        SELECT doc_id, source, text, unnest(range(
                   GREATEST(1, CAST(CEIL((length(text) - 100) / 400.0) AS BIGINT))
               )) AS ord
        FROM documents
    )
    GROUP BY source
    UNION ALL
    SELECT 'budget', source, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(ws) AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM (
        SELECT doc_id, source, ws,
               SUM(ws) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
                     CAST(len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ({{stop_set}}))) AS BIGINT)
                       / CAST(len(string_split(text, ' ')) AS BIGINT) AS q
              FROM documents)
    ) WHERE cum <= {_BUDGET_TOKENS}
    GROUP BY source
    UNION ALL
    SELECT 'dupspan', d.source, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(st.dup_tokens) AS BIGINT), CAST(SUM(st.n_spans) AS BIGINT),
           CAST(SUM(sc.fp) AS BIGINT), CAST(SUM(d.doc_id) AS BIGINT)
    FROM dup_stats st
    JOIN documents d USING (doc_id)
    JOIN dup_scrub sc USING (doc_id)
    GROUP BY d.source
    UNION ALL
    SELECT 'hh', token, cnt,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM documents) toks
        GROUP BY token
        HAVING COUNT(*) * 200 >= (
            SELECT COUNT(*) FROM (SELECT unnest(string_split(lower(text), ' ')) AS t2
                                  FROM documents) x)
    )
    UNION ALL
    SELECT 'temp', tsrc, CAST(COUNT(*) AS BIGINT),
           CAST(MAX(tn) AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM (SELECT g.doc_id, g.tsrc, c.tn
          FROM (SELECT doc_id,
                       CASE WHEN doc_id % 10 < 6 THEN 'big'
                            WHEN doc_id % 10 < 9 THEN 'mid'
                            ELSE 'small' END AS tsrc
                FROM documents) g
          JOIN (SELECT tsrc, CAST(COUNT(*) AS BIGINT) AS tn
                FROM (SELECT CASE WHEN doc_id % 10 < 6 THEN 'big'
                                  WHEN doc_id % 10 < 9 THEN 'mid'
                                  ELSE 'small' END AS tsrc
                      FROM documents) GROUP BY tsrc) c USING (tsrc)) tj
    WHERE {SM.temperature_predicate_sql('doc_id', 'tn',
           "(SELECT MIN(tn2) FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tn2 FROM (SELECT CASE WHEN doc_id % 10 < 6 THEN 'big' WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'small' END AS ts2 FROM documents) GROUP BY ts2))")}
    GROUP BY tsrc
    UNION ALL
    SELECT 'url', source, CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT dom) AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(CAST(('0x' || substr(md5(nurl), 1, 8)) AS BIGINT)) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM ukept WHERE rk <= 10
    GROUP BY source
    UNION ALL
    SELECT 'linededup', d.source, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(st.dup_lines) AS BIGINT), CAST(SUM(st.dup_chars) AS BIGINT),
           CAST(SUM(sc.fp) AS BIGINT), CAST(SUM(d.doc_id) AS BIGINT)
    FROM lstats st
    JOIN lld d USING (doc_id)
    JOIN lscrub sc USING (doc_id)
    GROUP BY d.source
    UNION ALL
    SELECT 'winnow', source, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nf) AS BIGINT), CAST(NULL AS BIGINT),
           CAST(SUM(sf) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM (
        SELECT doc_id, source, len(e) AS nf, CAST(list_sum(e) AS BIGINT) AS sf
        FROM (SELECT doc_id, source,
                     {FP.winnow_encoded_sql('text', 5, 4)} AS e
              FROM documents) __w
    ) __ws
    WHERE nf > 0
    GROUP BY source
    """.format(
        sample_pred=SM.sample_predicate_sql("doc_id", 0.25, seed="dev"),
        mix_pred=" OR ".join(
            f"(source = '{s}' AND {SM.sample_predicate_sql('doc_id', fr, seed='mx')})"
            for s, fr in _MIX_FRACTIONS.items()
        ),
        stop_set=", ".join(f"'{w}'" for w in X.STOPWORDS),
    ),
    doc="Corpus token accounting by source (N4, 'all': exact integer sums) "
    "and its dataset-assembly companions as tagged branches over the same "
    "schema: 'salted' recomputes the identical stats through the two-phase "
    "salted aggregation (operators/skew.py — phase-2 bounded by keys × "
    "salts, exact equivalence witnessed against the plain GROUP BY oracle); "
    "'sample' = deterministic 25% Bernoulli-by-hash keep-set; 'strat' = "
    "exact 5-per-source stratified sample (hash-ranked, one shuffle); "
    "'mix' = weighted source mixture (src0 100% / src1 50% / src2 25% / "
    "src3 10%, zero shuffle); 'rep' = membership of the Gopher "
    "duplicate-2-gram filter (dup_gram_frac ≥ 0.1, operators/text.py "
    "repetition_signals); 'chunk' = fixed-window document chunking "
    "(operators/text.py chunk_documents, 500-char windows / stride 400, "
    "zero-shuffle sequence+explode) — chars sums every chunk's actual "
    "substring length and id_sum folds in chunk ordinals, pinning window "
    "offsets, coverage, and per-doc multiplicity. id_sum pins exact "
    "membership of every keep-set; 'budget' = token-budget corpus "
    "selection (operators/sampling.py budget_select: per-source greedy "
    "best-quality-first prefix — stopword-ratio rank, doc_id tiebreak — "
    "kept while the running token total stays ≤ 2000; one group-keyed "
    "window shuffle, exact integer semantics; global-budget twin "
    "budget_select_global rides ranking.with_global_cumsum's two-pass "
    "range shuffle, no single-partition window, tests/"
    "test_budget_select.py); 'dupspan' = cross-document repeated "
    "5-gram spans (Lee et al. 2022 exact substring dedup, "
    "operators/dedup.py duplicate_ngram_* / remove_duplicate_ngrams: one "
    "gram hash-aggregate shuffle + semi join, interval-union island merge "
    "over the duplicated residue, relational span removal) — n_docs / "
    "ws_tokens / bpe_tokens carry affected docs, covered tokens, and "
    "merged-span count per source; chars sums a 32-bit md5 prefix of each "
    "affected doc's scrubbed text, pinning the rewrite byte-for-byte; "
    "brute-force property tests in tests/test_dupspan.py; 'hh' = exact "
    "heavy-hitter tokens "
    "(operators/text.py exact_heavy_hitters: per-partition Misra-Gries "
    "candidate sketch + exact recount, partitioning-invariant by the "
    "retention bound — source carries the token, n_docs its exact count; "
    "property tests in tests/test_heavy_hitters.py); 'temp' = "
    "sqrt-temperature mixture sampling (operators/sampling.py "
    "sqrt_temperature_sample: per-source keep probability "
    "sqrt(n_min/n_s) via exact integer cross-multiplication "
    "bucket^2*n_s < 16^8*n_min in DECIMAL/HUGEINT — radical-free, "
    "float-free, hash-exact cross-engine) over a derived 60/30/10 "
    "skew grouping (the real sources are uniform); brute-force + "
    "flattening + DuckDB-parity tests in tests/test_sampling.py); "
    "'url' = web-corpus "
    "curation (operators/web.py: normalize_url_expr strips tracking "
    "params/fragments/default ports, lowercases scheme+host, sorts "
    "surviving query params; registrable_domain_expr's two-level-suffix "
    "heuristic; per_domain_cap's deterministic md5-rank window, cap 10) "
    "over per-doc derived URLs built identically on both engines — "
    "normalization pinned byte-for-byte via md5-prefix sums, the cap "
    "selection exactly; Spark/DuckDB generators share the frozen "
    "TRACKING_PARAMS / TWO_LEVEL_SUFFIXES tables, fixture + parity + "
    "cap-property tests in tests/test_web.py); 'linededup' = "
    "line-level cross-document dedup (RefinedWeb/FineWeb primitive, "
    "operators/dedup.py duplicate_line_occurrences/stats/"
    "remove_duplicate_lines: trim-form matching, verbatim removal, "
    "lossless '\\n' rebuild) over an in-query derived line corpus "
    "(per-source header + text + global footer, identical on both "
    "engines) — dup_lines/dup_chars totals plus an md5-prefix sum of "
    "every scrubbed text; brute-force + identity property tests in "
    "tests/test_linededup.py; 'winnow' = "
    "rolling-hash document fingerprints (Schleimer et al. 2003 winnowing, "
    "operators/fingerprint.py: 32-bit md5-prefix k-gram hashes, "
    "rightmost-minimum of every w-hash window, position dedup — the MOSS "
    "guarantee: any shared substring of length >= w+k-1 surfaces as a "
    "shared fingerprint) — ws_tokens counts fingerprints, chars sums the "
    "encoded (position, hash) values, pinning selection exactly; the "
    "pair-detection form winnow_pairs (fingerprint-hash equi-join + "
    "shared-count threshold) is property-tested in "
    "tests/test_fingerprint.py.",
)
def n10_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators.skew import salted_agg

    d = T(spark, sf, "documents")
    # The tokenized projection feeds BOTH the 'all' and 'salted' branches,
    # whose aggregates have different topologies (plain groupBy vs
    # two-phase salted) — no common exchange for AQE to reuse, so without
    # a cache each branch re-runs the full text scan + the bpe
    # regexp_extract_all tokenization (the most expensive per-row
    # expression in this query). Persist the NUMERIC projection once
    # (r15, guide §2.4/§5): the cached rows carry five numbers per doc —
    # no text — so the memory cost is ~40 bytes/doc at any corpus scale
    # while the saving is a full corpus scan + regexp pass. Deferred
    # release like the dspan/line caches below. Measured (pair_ab,
    # 6 interleaved rounds vs the r14 archive): n10 paired median 0.88x;
    # at 100 TB the removed second tokenization scan dominates.
    sig = SESS.defer_unpersist(
        d.select(
            "doc_id",
            "source",
            "n_chars",
            X.n_tokens(F.col("text")).alias("ws"),
            X.bpe_token_count(F.col("text")).alias("bpe"),
        ).persist()
    )

    def shape(df: DataFrame, tag: str, with_tokens: bool) -> DataFrame:
        nil = F.lit(None).cast("long")
        return df.select(
            F.lit(tag).alias("tag"),
            F.col("source"),
            F.col("n_docs"),
            (F.col("ws_tokens") if with_tokens else nil).alias("ws_tokens"),
            (F.col("bpe_tokens") if with_tokens else nil).alias("bpe_tokens"),
            (F.col("chars") if with_tokens else nil).alias("chars"),
            F.col("id_sum"),
        )

    full_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpe_tokens"),
        F.sum("n_chars").alias("chars"),
        F.sum("doc_id").alias("id_sum"),
    ]
    sample_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    ]
    all_b = shape(sig.groupBy("source").agg(*full_aggs), "all", True)
    salted_b = shape(
        salted_agg(
            sig,
            ["source"],
            {
                "n_docs": ("count", "*"),
                "ws_tokens": ("sum", "ws"),
                "bpe_tokens": ("sum", "bpe"),
                "chars": ("sum", "n_chars"),
                "id_sum": ("sum", "doc_id"),
            },
            n_salts=8,
        ),
        "salted",
        True,
    )
    sample_b = shape(
        SM.hash_sample(d.select("doc_id", "source"), "doc_id", 0.25, seed="dev")
        .groupBy("source")
        .agg(*sample_aggs),
        "sample",
        False,
    )
    strat_b = shape(
        SM.stratified_sample(d.select("doc_id", "source"), ["source"], 5, "doc_id", seed="s1")
        .groupBy("source")
        .agg(*sample_aggs),
        "strat",
        False,
    )
    mix_b = shape(
        SM.mix_sources(d.select("doc_id", "source"), "source", _MIX_FRACTIONS, "doc_id", seed="mx")
        .groupBy("source")
        .agg(*sample_aggs),
        "mix",
        False,
    )
    rep_b = shape(
        X.repetition_signals(d, "doc_id", "text", n=2)
        .filter(F.col("dup_gram_frac") >= _REP_THRESHOLD)
        .select(F.col("doc_id"), F.lit(None).cast("string").alias("source"))
        .groupBy("source")
        .agg(*sample_aggs),
        "rep",
        False,
    )
    # 'chunk' — fixed 500-char windows, stride 400 (operators/text.py
    # chunk_documents): n_docs counts chunks, chars sums the actual chunk
    # lengths (overlap included — pins the substring windows exactly),
    # id_sum adds chunk_ord so the per-doc multiplicity AND ordinal set
    # are both pinned.
    nil_l = F.lit(None).cast("long")
    chunk_b = (
        X.chunk_documents(
            d.select("doc_id", "source", "text"), "doc_id", "text",
            size=500, stride=400,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunk_chars").alias("chars"),
            F.sum(F.col("doc_id") + F.col("chunk_ord")).alias("id_sum"),
        )
        .select(
            F.lit("chunk").alias("tag"),
            "source",
            "n_docs",
            nil_l.alias("ws_tokens"),
            nil_l.alias("bpe_tokens"),
            "chars",
            "id_sum",
        )
    )

    # 'budget' — token-budget corpus selection (operators/sampling.py
    # budget_select): per source, take documents best-quality-first
    # (stopword ratio desc, doc_id tiebreak) while the running whitespace-
    # token total stays within the per-source allowance. n_docs/ws_tokens/
    # id_sum pin the exact keep-set and its token mass.
    bq_in = d.select(
        "doc_id",
        "source",
        X.n_tokens(F.col("text")).alias("ws"),
        (X.stopword_hits(F.col("text")) / X.n_tokens(F.col("text"))).alias("q"),
    )
    budget_b = (
        SM.budget_select(
            bq_in, ["source"], [F.col("q").desc(), "doc_id"], "ws",
            budget=_BUDGET_TOKENS,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("budget").alias("tag"),
            "source",
            "n_docs",
            "ws_tokens",
            nil_l.alias("bpe_tokens"),
            nil_l.alias("chars"),
            "id_sum",
        )
    )

    # 'dupspan' — cross-document repeated 5-gram spans (Lee et al. 2022
    # substring dedup, operators/dedup.py): per-source affected-doc count,
    # total covered tokens, merged-span count, and the sum of a 32-bit md5
    # prefix of each affected doc's scrubbed text — pinning occurrence
    # detection, interval union, AND the span-removal rewrite byte-for-byte.
    # The corpus-wide gram shuffle runs ONCE: spans are computed and
    # persisted (deferred-release registry), then both the stats and the
    # span-removal passes derive from the residue-sized cached table.
    dspans = SESS.defer_unpersist(
        D.duplicate_ngram_spans(d, "doc_id", "text", n=5, min_docs=2).persist()
    )
    dstats = D.duplicate_ngram_stats(
        d, "doc_id", "text", n=5, min_docs=2, spans=dspans
    )
    dscrub = D.remove_duplicate_ngrams(
        d.select("doc_id", "source", "text"), "doc_id", "text", n=5, min_docs=2,
        spans=dspans,
    )
    scrub_fp = FN.md5_prefix_long("scrub_text")
    dupspan_b = (
        dstats.join(
            dscrub.select("doc_id", "source", scrub_fp.alias("__fp")), "doc_id"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dup_tokens").alias("ws_tokens"),
            F.sum("n_spans").alias("bpe_tokens"),
            F.sum("__fp").alias("chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("dupspan").alias("tag"),
            "source",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "chars",
            "id_sum",
        )
    )

    # 'hh' — exact heavy hitters: sketch proposes, recount decides (the
    # declared threshold cnt*200 >= N is integer-exact on both engines).
    toks = d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"))
    hh_b = X.exact_heavy_hitters(toks, "token", denom=200).select(
        F.lit("hh").alias("tag"),
        F.col("token").alias("source"),
        F.col("cnt").alias("n_docs"),
        nil_l.alias("ws_tokens"),
        nil_l.alias("bpe_tokens"),
        nil_l.alias("chars"),
        nil_l.alias("id_sum"),
    )

    # 'temp' — sqrt-temperature mixture sampling (operators/sampling.py
    # sqrt_temperature_sample): the GPT-3-style source reweighting with
    # per-source keep probability sqrt(n_min/n_s), decided by EXACT
    # integer cross-multiplication (bucket²·n_s < 16^8·n_min in
    # DECIMAL/HUGEINT — no float, no sqrt), so the keep-set hash-matches
    # the oracle bit-for-bit. The real sources are uniform (25 docs
    # each ⇒ the op would be the identity), so the witness derives a
    # skewed 60/30/10 grouping from doc_id — identically on both
    # engines. ws_tokens carries each group's pre-sample count.
    tgrp_c = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("big"))
        .when(F.col("doc_id") % 10 < 9, F.lit("mid"))
        .otherwise(F.lit("small"))
    )
    td = d.select("doc_id", tgrp_c.alias("tsrc"))
    tcnt = td.groupBy("tsrc").agg(F.count(F.lit(1)).alias("__tcount"))
    temp_b = (
        SM.sqrt_temperature_sample(td, "tsrc", "doc_id")
        .join(F.broadcast(tcnt), "tsrc")
        .groupBy("tsrc")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("__tcount").alias("ws_tokens"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("temp").alias("tag"),
            F.col("tsrc").alias("source"),
            "n_docs",
            "ws_tokens",
            nil_l.alias("bpe_tokens"),
            nil_l.alias("chars"),
            "id_sum",
        )
    )

    # 'url' — web-corpus curation (operators/web.py): URL
    # canonicalization (tracking-param strip, case/port/fragment rules,
    # bytewise param sort), registrable-domain extraction (two-level
    # suffix heuristic), and the deterministic per-domain cap (md5-rank
    # window, ≤10 docs per domain). The documents table carries no URL,
    # so the witness derives one per doc — mixed-case host from the
    # source (half .CO.UK, half .Example.COM so the suffix rule AND a
    # shared-megadomain skew case are both exercised), tracking params,
    # unsorted survivors, and a fragment — identically on both engines.
    # Witness per source: kept docs, distinct domains, md5-prefix sum of
    # the canonical URLs, id sum — pinning normalization byte-for-byte
    # and the exact cap selection.
    udf_url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".CO.UK")).otherwise(
            F.lit(".Example.COM")
        ),
        F.lit("/Docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&b=2&a=1#s"),
    )
    ud = d.select("doc_id", "source", udf_url.alias("url"))
    ucapped = WB.per_domain_cap(ud, "url", 10, "doc_id", keep_rank=True)
    nurl_fp = FN.md5_prefix_long(WB.normalize_url_expr(F.col("url")))
    url_b = (
        ucapped.select("doc_id", "source", "domain", nurl_fp.alias("__fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("domain").alias("ws_tokens"),
            F.sum("__fp").alias("chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("url").alias("tag"),
            "source",
            "n_docs",
            "ws_tokens",
            nil_l.alias("bpe_tokens"),
            "chars",
            "id_sum",
        )
    )

    # 'linededup' — line-level cross-document dedup (the RefinedWeb /
    # FineWeb primitive, operators/dedup.py duplicate_line_* /
    # remove_duplicate_lines). The raw documents are single-line, so the
    # witness derives a line-structured corpus in-query: a per-source
    # header line (duplicated across that source's docs), the original
    # text as the middle line, and a globally-shared footer — both
    # engines build the identical corpus from the same concat. Witness:
    # per source, affected docs, removed-line and removed-char totals,
    # and the md5-prefix sum of each scrubbed text — pinning trim-form
    # matching, verbatim-line removal, and the ordered '\n' rebuild
    # byte-for-byte (the scrub must reduce exactly to the original
    # text wherever the text itself is not cross-doc duplicated).
    # The corpus-wide line shuffle runs ONCE via the persisted
    # occurrence table, as dupspan does for grams.
    lt = F.concat(
        F.lit("== section "),
        F.col("source"),
        F.lit(" ==\n"),
        F.col("text"),
        F.lit("\nshared footer boilerplate"),
    )
    ld = d.select("doc_id", "source", lt.alias("ltext"))
    locc = SESS.defer_unpersist(
        D.duplicate_line_occurrences(ld, "doc_id", "ltext").persist()
    )
    lstats = D.duplicate_line_stats(ld, "doc_id", "ltext", occurrences=locc)
    lscrub = D.remove_duplicate_lines(ld, "doc_id", "ltext", occurrences=locc)
    lfp = FN.md5_prefix_long("line_scrub_text")
    linededup_b = (
        lstats.join(
            lscrub.select("doc_id", "source", lfp.alias("__fp")), "doc_id"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dup_lines").alias("ws_tokens"),
            F.sum("dup_chars").alias("bpe_tokens"),
            F.sum("__fp").alias("chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("linededup").alias("tag"),
            "source",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "chars",
            "id_sum",
        )
    )

    # 'winnow' — rolling-hash document fingerprints (Schleimer et al.
    # 2003, operators/fingerprint.py): per source, docs with fingerprints,
    # total fingerprint count, and the sum of every encoded (position,
    # hash32) fingerprint — pinning the k-gram rolling hashes, the
    # rightmost-minimum window selection, and the position dedup exactly.
    # Scan-speed column expressions; the one pre-aggregate exchange is a
    # deliberate round-robin repartition of the raw text: winnowing is
    # CPU-bound (one md5 per character k-gram), and a small corpus file
    # arrives as a single input split — without the spread the whole
    # hash chain runs on one core (measured 20 s vs 6 s at sf0.1 on
    # local[32]). At cluster scale the scan is already multi-split and
    # the exchange moves only the text bytes it would shuffle anyway.
    # The docs-with-fingerprints predicate is expressed as length(text)
    # >= k, NOT size(__e) > 0: they are equivalent (m >= 1 k-gram hashes
    # guarantees the single-window global minimum is selected), but the
    # size form is a filter over the full winnowing chain, and the
    # optimizer pushes filters through Repartition — re-running the md5
    # chain serially on the raw scan's single input split (measured: a
    # 9 s one-task stage at sf0.1) before the spread even happens. The
    # length form is scan-pushable and free.
    winnow_b = (
        d.filter(F.length("text") >= 5)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "source",
            # array projected once BELOW the consumers — size and sum
            # must not each re-run the winnowing chain (the explode-
            # sibling re-evaluation lesson).
            FP.winnow_encoded_expr(F.col("text"), 5, 4).alias("__e"),
        )
        .select(
            "doc_id",
            "source",
            F.size("__e").alias("__n"),
            F.aggregate("__e", F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "__s"
            ),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("ws_tokens"),
            F.sum("__s").alias("chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .select(
            F.lit("winnow").alias("tag"),
            "source",
            "n_docs",
            "ws_tokens",
            nil_l.alias("bpe_tokens"),
            "chars",
            "id_sum",
        )
    )

    return all_b.unionAll(salted_b).unionAll(sample_b).unionAll(strat_b).unionAll(
        mix_b
    ).unionAll(rep_b).unionAll(chunk_b).unionAll(budget_b).unionAll(
        dupspan_b
    ).unionAll(hh_b).unionAll(temp_b).unionAll(url_b).unionAll(linededup_b).unionAll(winnow_b)


# --------------------------------------------------------------------------
# N4e — data-valuation suite: count-based TF-IDF + bigram-LM scoring +
# DSIR importance selection (SURVEY §2.3 N4). Three tagged branches on the
# generic (tag, k1, k2, n1, n2, v1, v2) union schema (the t01/t03 pattern;
# the driver caps the corpus at 50 entries, so new operators merge into
# existing rows). Every double is an exact BIGINT/BIGINT rational or a
# BIGINT product of one — no transcendental, so both engines produce
# bit-identical values:
#   'tfidf' — tf per (doc, token), idf as the exact rational N/df (the
#             ln() variant is a one-line swap);
#   'lm'    — operators/lm.py lm_doc_stats: val/test docs scored against
#             unigram/bigram count tables trained on the 'corpus-v1'
#             train split (the CCNet recipe's integer skeleton; the
#             add-α log-likelihood lives in lm_loglik, tolerance-tested);
#   'dsir'  — operators/lm.py dsir_scores/dsir_select: top-40 raw docs by
#             hashed-n-gram importance ratio against the src0 target
#             domain (exact-rational DSIR form; 4096 md5 buckets).
# --------------------------------------------------------------------------
_N17_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, tok
    ),
    dfx AS (
        SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    tfidf_b AS (
        SELECT 'tfidf' AS tag, CAST(tf.doc_id AS VARCHAR) AS k1, tf.tok AS k2,
               tf.tf AS n1, dfx.df AS n2,
               tf.tf * (CAST(n.n_docs AS DOUBLE) / dfx.df) AS v1,
               CAST(NULL AS DOUBLE) AS v2
        FROM tf JOIN dfx USING (tok) CROSS JOIN n
        WHERE dfx.df >= 50
    ),
    tagged AS (SELECT doc_id, text, {v1_case} AS split FROM documents),
    tr AS (SELECT string_split(lower(text), ' ') AS w FROM tagged
           WHERE split = 'train'),
    uni AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(w) AS tok FROM tr) GROUP BY tok
    ),
    bi AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS c12
        FROM (SELECT w[i + 1] || ' ' || w[i + 2] AS g
              FROM (SELECT w, unnest(range(len(w) - 1)) AS i
                    FROM tr WHERE len(w) >= 2))
        GROUP BY g
    ),
    vg AS (
        SELECT doc_id, w[i + 1] AS w1, w[i + 1] || ' ' || w[i + 2] AS g
        FROM (SELECT doc_id, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                    FROM tagged WHERE split != 'train')
              WHERE len(w) >= 2)
    ),
    vgc AS (
        SELECT doc_id, g, w1, CAST(COUNT(*) AS BIGINT) AS c
        FROM vg GROUP BY doc_id, g, w1
    ),
    lm_b AS (
        SELECT 'lm' AS tag, CAST(vgc.doc_id AS VARCHAR) AS k1,
               CAST(NULL AS VARCHAR) AS k2,
               CAST(SUM(c) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN bi.c12 IS NULL THEN c ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(SUM(c * COALESCE(bi.c12, 0)) AS DOUBLE)
                   / CAST(SUM(c) AS BIGINT) AS v1,
               CAST(SUM(c * COALESCE(uni.c1, 0)) AS DOUBLE)
                   / CAST(SUM(c) AS BIGINT) AS v2
        FROM vgc LEFT JOIN bi USING (g) LEFT JOIN uni ON vgc.w1 = uni.tok
        GROUP BY vgc.doc_id
    ),
    feats AS (
        SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS feat
        FROM documents
        UNION ALL
        SELECT doc_id, source, w[i + 1] || ' ' || w[i + 2] AS feat
        FROM (SELECT doc_id, source, w, unnest(range(len(w) - 1)) AS i
              FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS w
                    FROM documents)
              WHERE len(w) >= 2)
    ),
    fb AS (
        SELECT doc_id, source, substr(md5('dsir:' || feat), 1, 3) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM feats GROUP BY doc_id, source, b
    ),
    tgt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS t FROM fb
            WHERE source = 'src0' GROUP BY b),
    raw AS (SELECT b, CAST(SUM(c) AS BIGINT) AS r FROM fb GROUP BY b),
    sc AS (
        SELECT doc_id, source,
               CAST(SUM(c * (COALESCE(t, 0) + 1)) AS BIGINT) AS num,
               CAST(SUM(c * (COALESCE(r, 0) + 1)) AS BIGINT) AS den
        FROM fb LEFT JOIN tgt USING (b) LEFT JOIN raw USING (b)
        GROUP BY doc_id, source
    ),
    dsir_b AS (
        SELECT 'dsir' AS tag, CAST(doc_id AS VARCHAR) AS k1, source AS k2,
               num AS n1, den AS n2,
               CAST(num AS DOUBLE) / den AS v1, CAST(NULL AS DOUBLE) AS v2
        FROM sc ORDER BY CAST(num AS DOUBLE) / den DESC, doc_id LIMIT 40
    )
    SELECT * FROM tfidf_b
    UNION ALL SELECT * FROM lm_b
    UNION ALL SELECT * FROM dsir_b
    UNION ALL
    SELECT 'bm25', CAST(doc_id AS VARCHAR), CAST(NULL AS VARCHAR),
           matched, dl, CAST(score_q AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM (SELECT doc_id, matched, dl, score_q
          FROM {bm25} ORDER BY score_q DESC, doc_id LIMIT 30)
"""


@query(
    "n17_tf_idf",
    oracle=_N17_ORACLE.format(
        v1_case=SM.split_case_sql("doc_id", _SPLIT_WEIGHTS, seed="corpus-v1"),
        bm25=RT.bm25_sql("documents", "doc_id", "text", _BM25_TERMS),
    ),
    doc="Data-valuation suite (N4), four tagged branches: 'tfidf' = "
    "count-based TF-IDF over unigrams (idf as the exact rational N/df, "
    "df≥50 keeps the declared result compact, df table broadcast at "
    "scale); 'lm' = bigram-LM scoring of the corpus-v1 val/test docs "
    "against count tables trained on the train split (operators/lm.py — "
    "exact integer witnesses: bigram mass, OOV occurrences, mean gram/"
    "context frequency as BIGINT/BIGINT rationals; the smoothed "
    "log-likelihood form is lm_loglik, tolerance-tested); 'bm25' = Okapi "
    "BM25 top-30 for a fixed 4-term query (operators/retrieval.py: exact "
    "BIGINT counts, dl/avgdl as the exact rational dl·N/total_dl, "
    "fixed-order pivoted summation, floor-quantized integer witness "
    "score_q at 1e-4 — Python-reference + DuckDB-parity tests in "
    "tests/test_bm25.py); 'dsir' = top-40 "
    "docs by DSIR-style hashed-n-gram importance ratio vs the src0 target "
    "domain (4096-bucket md5 features, exact-rational score, "
    "TakeOrderedAndProject selection).",
)
def n17_tf_idf(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators import lm as LM

    d = T(spark, sf, "documents")
    nil_s = F.lit(None).cast("string")
    nil_d = F.lit(None).cast("double")

    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df derived FROM tf, not from a second corpus-wide explode: tf holds
    # exactly one row per (doc, tok), so rows-per-tok == the distinct doc
    # count (r14, guide §2.4 — the old count_distinct form re-ran the
    # explode and paid a two-phase distinct aggregate). The row count is
    # expressed as sum(when(tf >= 1, 1)) — tf is a count, always >= 1, so
    # the value is identical — because a plain count() lets the optimizer
    # strip the count function out of the inner (doc, tok) aggregate,
    # leaving its exchange non-identical to the tfidf branch's; the
    # value-referencing form keeps both tf subtrees byte-identical so the
    # shuffle stage is computed ONCE (AQE stage reuse): one token explode
    # instead of two. Result-identical by construction; oracle unchanged.
    df_ = tf.groupBy("tok").agg(
        F.sum(F.when(F.col("tf") >= 1, 1)).alias("df")
    ).filter(F.col("df") >= 50)
    # N computed in-plan (1-row aggregate, cross-joined = broadcast of one
    # row) — no separate driver-side job; the df join is left to AQE, which
    # broadcasts it when it is small and shuffles when it is not.
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf_b = (
        tf.join(df_, "tok")
        .crossJoin(n)
        .select(
            F.lit("tfidf").alias("tag"),
            F.col("doc_id").cast("string").alias("k1"),
            F.col("tok").alias("k2"),
            F.col("tf").cast("long").alias("n1"),
            F.col("df").cast("long").alias("n2"),
            (F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))).alias("v1"),
            nil_d.alias("v2"),
        )
    )

    tagged = d.withColumn(
        "split", SM.hash_split(F.col("doc_id"), _SPLIT_WEIGHTS, seed="corpus-v1")
    )
    uni, bi = LM.lm_tables(tagged.filter("split = 'train'"))
    lm_b = LM.lm_doc_stats(tagged.filter("split != 'train'"), uni, bi).select(
        F.lit("lm").alias("tag"),
        F.col("doc_id").cast("string").alias("k1"),
        nil_s.alias("k2"),
        F.col("n_bigrams").alias("n1"),
        F.col("oov_bigrams").alias("n2"),
        F.col("mean_c12").alias("v1"),
        F.col("mean_ctx").alias("v2"),
    )

    sel = LM.dsir_select(
        LM.dsir_scores(d, F.col("source") == "src0", carry=["source"]), 40
    )
    dsir_b = sel.select(
        F.lit("dsir").alias("tag"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("source").alias("k2"),
        F.col("num").alias("n1"),
        F.col("den").alias("n2"),
        F.col("score").alias("v1"),
        nil_d.alias("v2"),
    )

    # 'bm25' — Okapi BM25 relevance top-30 for the fixed 4-term query
    # (operators/retrieval.py): every count exact BIGINT, per-term
    # contributions summed in the literal term order through pivoted
    # columns (never a float SUM aggregate), witness = floor-quantized
    # integer score (the mlq pattern — ln may drift 1 ulp across libms).
    bm25_b = RT.bm25_topk(d, "doc_id", "text", _BM25_TERMS, k=30).select(
        F.lit("bm25").alias("tag"),
        F.col("doc_id").cast("string").alias("k1"),
        nil_s.alias("k2"),
        F.col("matched").alias("n1"),
        F.col("dl").alias("n2"),
        F.col("score_q").cast("double").alias("v1"),
        nil_d.alias("v2"),
    )

    return tfidf_b.unionAll(lm_b).unionAll(dsir_b).unionAll(bm25_b)


# --------------------------------------------------------------------------
# N5 — multimodal content addressing
# --------------------------------------------------------------------------
@query(
    "n11_multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN strlen(text) % 3 = 0 THEN 'image/png'
                WHEN strlen(text) % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           sha256(text) AS sha256,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="Content-addressed multimodal metadata over opaque payloads: sha256 "
    "digest, byte length, deterministic mime witness (N5; mime_sniff="
    "'witness' — the synthetic testdata carries no container magic bytes, "
    "so the DuckDB-expressible length-derived label is the declared "
    "witness; the production default sniffs real PNG/RIFF/ftyp/EBML "
    "prefixes via built-in substring equality, "
    "tests/test_multimodal.py::test_sniff_mime_magic_bytes). The decode / "
    "feature-extraction path is operators.multimodal.extract_features "
    "(mapInPandas, stubbed codecs).",
)
def n11_multimodal_metadata(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators.multimodal import attach_media_metadata

    d = T(spark, sf, "documents")
    return attach_media_metadata(d, "doc_id", "text", mime_sniff="witness").select(
        "media_id", "mime", "sha256", "n_bytes"
    )


# --------------------------------------------------------------------------
# N5b — multimodal feature extraction (Arrow-batched mapInPandas). The stub
# codec derives each feature as float32(u32) / 2^32 from sha256 bytes; both
# steps are exactly reproducible in SQL (round-to-nearest float32 of an
# integer, then an exact power-of-two divide), so the query carries a full
# oracle: the vector is posexploded to scalar (media_id, pos, value) rows,
# which is also the canonicalizer-safe shape (arrays are unhashable there).
# --------------------------------------------------------------------------
def _sql_u32_le(hex_expr: str, pos_expr: str) -> str:
    """u32 little-endian from hex chars 8*pos+1 .. 8*pos+8 of ``hex_expr``
    (mirrors numpy ``frombuffer(h, '<u4')[pos]`` on the digest bytes)."""
    nib = "(instr('0123456789abcdef', substr({h}, {p}, 1)) - 1)"
    bytes_ = []
    for j in range(4):  # byte j at 1-based hex positions 8*pos + 2j+1, 2j+2
        hi = nib.format(h=hex_expr, p=f"8 * {pos_expr} + {2 * j + 1}")
        lo = nib.format(h=hex_expr, p=f"8 * {pos_expr} + {2 * j + 2}")
        bytes_.append(f"(({hi}) * 16 + ({lo})) * {256 ** j}")
    return "(" + " + ".join(bytes_) + ")"


@query(
    "n11b_multimodal_features",
    oracle=f"""
    WITH m AS (SELECT doc_id AS media_id, sha256(text) AS sha FROM documents),
    h AS (SELECT media_id, sha, sha256(sha) AS hh FROM m),
    p AS (SELECT unnest(range(8)) AS pos),
    fr AS (SELECT unnest(range(4)) AS i)
    SELECT 'feat' AS tag, media_id, sha AS sha256, CAST(pos AS BIGINT) AS pos,
           CAST(CAST({_sql_u32_le('hh', 'pos')} AS REAL) AS DOUBLE)
             / 4294967296.0 AS value
    FROM h CROSS JOIN p
    UNION ALL
    SELECT 'resize', media_id, sha256(sha || ':64x64'),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM m
    UNION ALL
    SELECT 'frames', media_id,
           sha256(sha || ':frame' || CAST(i AS VARCHAR)),
           CAST(i AS BIGINT), CAST(NULL AS DOUBLE)
    FROM m CROSS JOIN fr
    """,
    doc="Decode/feature-extract plumbing over media payloads, three tagged "
    "mapInPandas branches (all Arrow-batched, stubbed codecs; N5): 'feat' "
    "= 8-dim hash-derived feature vectors posexploded to one row per "
    "position (float32(u32)/2^32 is bit-reproducible in SQL); 'resize' = "
    "64x64 thumbnail generation (operators/multimodal.py resize_images — "
    "the thumb content address is a pure function of payload digest + "
    "dims, so the oracle reproduces it); 'frames' = uniform 4-frame "
    "sampling (sample_frames — one row per (media, frame_idx), content "
    "address from (digest, index)). All three branches oracle-exact.",
)
def n11b_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators.multimodal import (
        attach_media_metadata,
        extract_features,
        resize_images,
        sample_frames,
    )

    d = T(spark, sf, "documents")
    media = attach_media_metadata(d, "doc_id", "text")
    feats = extract_features(media, dim=8)
    nil_l = F.lit(None).cast("long")
    nil_d = F.lit(None).cast("double")
    feat_b = (
        feats.select("media_id", "sha256", F.posexplode("feature").alias("pos", "value"))
        .select(
            F.lit("feat").alias("tag"),
            "media_id",
            "sha256",
            F.col("pos").cast("long").alias("pos"),
            F.col("value").cast("double").alias("value"),
        )
    )
    resize_b = resize_images(media, width=64, height=64).select(
        F.lit("resize").alias("tag"),
        "media_id",
        F.col("thumb").alias("sha256"),
        nil_l.alias("pos"),
        nil_d.alias("value"),
    )
    frames_b = sample_frames(media, n_frames=4).select(
        F.lit("frames").alias("tag"),
        "media_id",
        F.col("frame_sha256").alias("sha256"),
        F.col("frame_idx").cast("long").alias("pos"),
        nil_d.alias("value"),
    )
    return feat_b.unionAll(resize_b).unionAll(frames_b)


# --------------------------------------------------------------------------
# N6-adjacent — sessionization and windowing (batch form of the streaming
# operators; the streaming variants live in streaming/events.py)
# --------------------------------------------------------------------------
@query(
    "n12_session_windows",
    oracle="""
    WITH m AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
    )
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="30-minute-gap sessionization per user via session_window — the same "
    "operator Structured Streaming uses; oracle is the gaps-and-islands SQL.",
)
def n12_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events")
    )


# --------------------------------------------------------------------------
# Temporal — as-of join: each 'view' event matched with the user's most
# recent 'purchase' at or before it. Our union-and-carry implementation
# (operators/temporal.py: ONE shuffle on the key, no range join) against
# DuckDB's native ASOF LEFT JOIN as the oracle.
# --------------------------------------------------------------------------
@query(
    "n19_asof_join",
    oracle="""
    WITH probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ),
    quotes AS (
        SELECT user_id, ts, value AS px FROM events WHERE event_type = 'purchase'
    ),
    base AS (
        SELECT p.event_id, p.user_id, p.ts, q.px, q.ts AS quote_ts
        FROM probes p ASOF LEFT JOIN quotes q
          ON p.user_id = q.user_id AND q.ts <= p.ts
    )
    SELECT 'asof' AS tag, event_id, user_id, ts, px, quote_ts FROM base
    UNION ALL
    SELECT 'tol2h', event_id, user_id, ts,
           CASE WHEN ts - quote_ts > INTERVAL 2 HOUR THEN NULL ELSE px END,
           CASE WHEN ts - quote_ts > INTERVAL 2 HOUR THEN NULL ELSE quote_ts END
    FROM base
    UNION ALL
    SELECT 'salted', event_id, user_id, ts, px, quote_ts FROM base
    """,
    doc="As-of join (temporal primitive Spark lacks natively): every view "
    "event joined with the user's latest purchase at or before it, NULLs "
    "when none precedes ('asof'), plus the staleness-tolerance form "
    "('tol2h': matches older than 2 hours are nulled — the operator's "
    "tolerance parameter, expressed in the oracle as a CASE over the "
    "untolerated ASOF result), plus the skew-hedged salted form "
    "('salted': as_of_join_salted replicates quotes across n_salts "
    "row-position probe salts so hot keys parallelize — bit-identical to "
    "the plain form by construction, so its oracle IS the plain ASOF "
    "result). Scale-safe union-and-carry plan — one shuffle on the key, "
    "no range-join pair explosion; oracle is DuckDB's native ASOF LEFT "
    "JOIN.",
)
def n19_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators.temporal import (
        as_of_join,
        as_of_join_salted,
    )

    ev = T(spark, sf, "events")
    probes = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("px")
    )
    cols = ["event_id", "user_id", "ts", "px", "quote_ts"]
    plain = as_of_join(probes, quotes, ["user_id"], "ts", ["px"]).select(
        F.lit("asof").alias("tag"), *cols
    )
    tol = as_of_join(
        probes,
        quotes,
        ["user_id"],
        "ts",
        ["px"],
        tolerance=F.expr("INTERVAL 2 HOURS"),
    ).select(F.lit("tol2h").alias("tag"), *cols)
    salted = as_of_join_salted(
        probes, quotes, ["user_id"], "ts", ["px"], n_salts=4
    ).select(F.lit("salted").alias("tag"), *cols)
    return plain.unionAll(tol).unionAll(salted)


@query(
    "n13_tumbling_windows",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="1-hour tumbling windows per event_type (batch form of the streaming "
    "windowed aggregation; cents-quantized exact sums).",
)
def n13_tumbling_windows(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.functions import cents

    ev = T(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# N2c — connected-components dedup clusters over the verified pair graph
# --------------------------------------------------------------------------
# Leakage-safe split: the assignment hashes the CLUSTER representative
# (cc label, or the doc's own id when unclustered), so a near-duplicate
# cluster can never straddle train/val/test — hashing doc_id directly
# would leak training near-dups into eval. Same md5 split machinery as
# the corpus splits (operators/sampling.py), different seed.
_CCSPLIT_CASE = SM.split_case_sql("grp", _SPLIT_WEIGHTS, seed="ccsplit")


@query(
    "n20_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    docs2 AS (
        SELECT d.doc_id, d.text FROM documents d JOIN survivors s USING (doc_id)
    ),
    {_sql_shingles('docs2')},
    {_SQL_MINHASH_BANDS},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON sa.doc_id = p.id_a
        JOIN shingles sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
        GROUP BY p.id_a, p.id_b
    ),
    verified AS (
        SELECT i.id_a, i.id_b
        FROM inter i
        JOIN sizes za ON za.doc_id = i.id_a
        JOIN sizes zb ON zb.doc_id = i.id_b
        WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION
        SELECT id_b AS src, id_a AS dst FROM verified
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    cc AS (SELECT node, MIN(r) AS label FROM reach GROUP BY node)
    SELECT 'cc' AS tag, node AS id, label AS lbl FROM cc
    UNION ALL
    SELECT 'kept' AS tag, s.doc_id AS id, CAST(NULL AS BIGINT) AS lbl
    FROM survivors s
    WHERE s.doc_id NOT IN (SELECT node FROM cc WHERE node <> label)
    UNION ALL
    SELECT 'split_' || ({_CCSPLIT_CASE}) AS tag, g.doc_id AS id, g.grp AS lbl
    FROM (
        SELECT s.doc_id, COALESCE(cc.label, s.doc_id) AS grp
        FROM survivors s LEFT JOIN cc ON cc.node = s.doc_id
    ) g
    """,
    doc="Connected-components dedup clusters (N2, operators/dedup.py "
    "connected_components): the verified near-dup pair graph from the n01 "
    "pipeline (exact-dedup survivors -> MinHash/LSH candidates -> Jaccard "
    ">= 0.5) collapsed to transitive clusters by hash-min label propagation "
    "(Pregel-style, one uniform node-keyed shuffle per iteration, "
    "localCheckpoint against lineage growth; converges in O(diameter) "
    "rounds - 2-3 on dup graphs). 'cc' = (node, min-id cluster label); "
    "'kept' = cluster-aware keep-set, strictly stronger than the pairwise "
    "drop-id_b policy on transitive chains (A~B~C collapses to one "
    "representative even when A!~C). 'split_<name>' = leakage-safe "
    "train/val/test assignment hashing the cluster representative "
    "(COALESCE(label, doc_id)) through the engine-invariant md5 split, so "
    "no near-dup cluster straddles splits (tests/test_connected_components"
    ".py pins zero straddling verified pairs). Oracle = DuckDB "
    "recursive-CTE transitive closure: the fixpoint labels are "
    "engine-independent.",
)
def n20_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    survivors = D.exact_dedup(docs.select("doc_id", "text"), "doc_id", "text")
    sh = SESS.defer_unpersist(
        D.word_shingles(survivors, "doc_id", "text", k=3).persist()
    )
    pairs = _minhash_pairs(sh)
    verified = D.jaccard_verify(sh, pairs, "doc_id", threshold=0.5)
    labels = D.connected_components(verified.select("id_a", "id_b"))
    cc = labels.select(
        F.lit("cc").alias("tag"),
        F.col("node").alias("id"),
        F.col("label").alias("lbl"),
    )
    drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    kept = (
        survivors.select("doc_id")
        .join(drop, "doc_id", "left_anti")
        .select(
            F.lit("kept").alias("tag"),
            F.col("doc_id").alias("id"),
            F.lit(None).cast("long").alias("lbl"),
        )
    )
    # Leakage-safe split: group by cluster representative, hash the GROUP.
    # The labels relation is tiny (dup-graph nodes only) — broadcast it so
    # the survivor scan picks up its group map-side, no shuffle.
    from pyspark.sql.functions import broadcast

    grp = (
        survivors.select("doc_id")
        .join(
            broadcast(labels.select(F.col("node").alias("doc_id"), "label")),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce("label", F.col("doc_id")).alias("grp"))
    )
    split = grp.select(
        F.concat(
            F.lit("split_"), SM.hash_split("grp", _SPLIT_WEIGHTS, seed="ccsplit")
        ).alias("tag"),
        F.col("doc_id").alias("id"),
        F.col("grp").alias("lbl"),
    )
    return cc.unionAll(kept).unionAll(split)




# --------------------------------------------------------------------------
# Rows-only scale variants, one driver row (50-row CORRECTNESS cap): the
# xxhash64/sketch-based production paths whose primitives have no DuckDB
# equivalent. Each is topology-proven by an oracle-backed twin (n02, n04,
# n05/n06b) or recall-pinned in tests (test_similarity.py); this union
# keeps them all witnessed by the driver without spending four rows.
# --------------------------------------------------------------------------
@query(
    "nx_scale_variants",
    oracle=None,
    doc="Tagged union of the rows-only scale paths on one generic "
    "schema (tag, k1, k2, n1, v1, s1): 'hll' = approx_count_distinct per "
    "returnflag (H11 — HLL sketches differ across engines by design); "
    "'mh128' = 128-seed xxhash64 MinHash + 16x8 LSH candidate pairs with "
    "the 1000-cap bucket guard (N2 scale path; see _N02B_DOC); 'sim64' = "
    "64-bit xxhash64 SimHash signatures (see _N04B_DOC); "
    "'lsh'/'ivf'/'q8'/'pq'/'ivfpq' = the approximate-NN family with "
    "recall pins (see _N05B_DOC; 'ivfpq' is the composed IVFADC serving "
    "shape); "
    "'semdedup' = SemDeDup semantic near-dup pairs (Abbas et al. 2023, "
    "operators/similarity.py semantic_dedup_pairs: k-means cell bucketing "
    "via the constant-plan broadcast assignment, exact cosine verify on "
    "same-cell pairs only — candidate volume n²/K; precision exact and "
    "planted-duplicate recall ≥0.9 pinned in tests/test_semantic_dedup.py; "
    "the Lloyd centroid loop has no SQL equivalent, hence rows-only, with "
    "the oracle-backed O(n²) twin n06 pinning pair semantics); 'semg' = "
    "the same SemDeDup recipe on the score='gemm' true-BLAS production "
    "path (r9: one A@B.T per score block instead of the 64-pass "
    "bit-identity replay — float-associative, tolerance + recall pinned "
    "in tests/test_gemm_score.py, the form 'auto' selects above the "
    "crossover); 'winnowp' "
    "= MOSS-style winnowing-fingerprint overlap pairs on the xxhash64 "
    "scale hash (operators/fingerprint.py winnow_pairs: postings-capped "
    "fp equi-join; the md5 form is n10's hash-checked 'winnow' branch, "
    "pair semantics brute-force-pinned for both hashes in "
    "tests/test_fingerprint.py).",
)
def nx_scale_variants(spark: SparkSession, sf: str) -> DataFrame:
    def g(df, tag_col, k1=None, k2=None, n1=None, v1=None, s1=None):
        nil_l = F.lit(None).cast("long")
        return df.select(
            (F.lit(tag_col) if isinstance(tag_col, str) else tag_col).alias("tag"),
            (F.col(k1).cast("long") if k1 else nil_l).alias("k1"),
            (F.col(k2).cast("long") if k2 else nil_l).alias("k2"),
            (F.col(n1).cast("long") if n1 else nil_l).alias("n1"),
            (F.col(v1).cast("double") if v1 else F.lit(None).cast("double")).alias("v1"),
            (F.col(s1) if s1 else F.lit(None).cast("string")).alias("s1"),
        )

    from sheetreader_duckdb_spark.plans.relational import h11_approx_count_distinct

    hll = g(h11_approx_count_distinct(spark, sf), "hll", k1="approx_parts", s1="l_returnflag")
    mh = g(n02b_dedup_minhash_xxhash(spark, sf), "mh128", k1="id_a", k2="id_b")
    sim = g(n04b_dedup_simhash64(spark, sf), "sim64", k1="doc_id", k2="simhash")
    ann = g(n05b_ann_lsh_topk(spark, sf), F.col("tag"), k1="qid", k2="cid", n1="rn", v1="cosine")
    # Cell count derived from parquet footer metadata (r13: previously a
    # plan-build count() — a bounded but eager Spark job carried since
    # r9; the footer num_rows is the same number with zero jobs): fixed
    # K degrades quadratically with corpus growth (candidate volume
    # n·(n/K) — the auto_srp_planes lesson applied to k-means bucketing).
    emb = T(spark, sf, "embeddings")
    n_emb = parquet_row_count(sf, "embeddings")
    sem = g(
        S.semantic_dedup_pairs(
            emb, n_cells=S.auto_ivf_cells(n_emb, target_cell=100),
            threshold=0.4, n_rows=n_emb,
        ),
        "semdedup",
        k1="id_a", k2="id_b", n1="cell", v1="cosine",
    )
    # The production scoring form as its own driver-run witness: same
    # recipe through score='gemm' (true BLAS per block — what 'auto'
    # selects above the crossover; float-associative, so it lives in
    # this rows-only union while the expr twin above stays the
    # plan-shape witness).
    semg = g(
        S.semantic_dedup_pairs(
            emb, n_cells=S.auto_ivf_cells(n_emb, target_cell=100),
            threshold=0.4, n_rows=n_emb, score="gemm",
        ),
        "semg",
        k1="id_a", k2="id_b", n1="cell", v1="cosine",
    )
    # winnow_pairs on the scale hash (xxhash64 grams, no DuckDB twin —
    # the md5 form is n10's hash-checked 'winnow' branch): MOSS-style
    # overlap candidates over the documents corpus, postings-capped.
    # Rows-only here; exact pair semantics are brute-force-pinned in
    # tests/test_fingerprint.py for both hashes.
    wp = g(
        FP.winnow_pairs(
            T(spark, sf, "documents"), "doc_id", "text",
            min_shared=2, max_hash_freq=200, hash="xxhash64",
        ),
        "winnowp",
        k1="id_a", k2="id_b", n1="shared_fps",
    )
    return (
        hll.unionAll(mh).unionAll(sim).unionAll(ann)
        .unionAll(sem).unionAll(semg).unionAll(wp)
    )
