"""LLM-data-pipeline queries over documents/embeddings (SURVEY §2.12).

Oracle-checked where SQL can express the op (exact dedup,
fingerprinting, blocked Jaccard, text quality, token counting,
brute-force cosine, multimodal envelope); rows-only for the
probabilistic operators (MinHash LSH, SimHash, LSH-ANN, IVF), whose
recall against the exact baseline is asserted in
tests/test_llm_ops.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.functions.text import (
    TOKEN_PATTERN,
    language_id,
    quality_metrics,
    token_count,
)
from ent_fins_lakehouse_spark.operators.dedup import (
    canonical_dedup,
    dedup_connected_components,
    fingerprint,
    jaccard_pairs_blocked,
    minhash_lsh_pairs,
    simhash_pairs,
)
from ent_fins_lakehouse_spark.operators.multimodal import extract_features, to_binary_column
from ent_fins_lakehouse_spark.operators.similarity import (
    ann_topk_lsh,
    build_ivf_index,
    cosine_pairs_blocked,
    cosine_topk,
    ivf_topk,
)
from ent_fins_lakehouse_spark.functions.detmath import (
    det_ln_ratio,
    det_ln_ratio_sql,
    det_mean4,
    det_mean4_sql,
    det_quantize4,
    det_quantize4_sql,
)
from ent_fins_lakehouse_spark.plans.checks import (
    multiset_diff_count,
    multiset_equal_col,
)
from ent_fins_lakehouse_spark.plans.registry import query
from ent_fins_lakehouse_spark.sources.readers import load_table

# Per-query persist registry: a query that caches an intermediate
# (e.g. q66's tf matrix, shared by three downstream branches) swaps its
# handle here, unpersisting the PREVIOUS invocation's cache first —
# repeated bench/correctness runs hold at most one cached copy per key
# instead of accumulating partitions until LRU eviction. atexit drops
# whatever is still live at shutdown.
_PERSISTED: dict[str, DataFrame] = {}
_PERSIST_ATEXIT_ARMED = False


def _swap_persist(key: str, df: DataFrame) -> DataFrame:
    import atexit

    global _PERSIST_ATEXIT_ARMED
    prev = _PERSISTED.pop(key, None)
    if prev is not None:
        prev.unpersist(blocking=False)
    if not _PERSIST_ATEXIT_ARMED:
        atexit.register(_unpersist_all)
        _PERSIST_ATEXIT_ARMED = True
    _PERSISTED[key] = df.persist()
    return _PERSISTED[key]


def _unpersist_all() -> None:
    while _PERSISTED:
        _, df = _PERSISTED.popitem()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


@query(
    "q50_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def q50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic canonical representative
    (min doc_id per identical text)."""
    docs = load_table(spark, sf_dir, "documents")
    return canonical_dedup(docs, ["text"], "doc_id").orderBy("doc_id")


@query(
    "q51_fingerprint",
    oracle="""
    SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_docs
    FROM (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    GROUP BY fingerprint ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def q51_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (md5 of whitespace-normalized lowercase
    text) + dedup accounting on the 32-byte digest instead of the
    document body — the at-scale exact-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        fingerprint(docs, "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_docs"))
        .orderBy("doc_id")
    )


@query(
    "q52_jaccard_near_dup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / len(list_distinct(list_concat(a.w, b.w))) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
          / len(list_distinct(list_concat(a.w, b.w))) >= 0.9
    ORDER BY id_a, id_b
    """,
    tags=("llm", "dedup"),
)
def q52_jaccard_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (unigram) Jaccard near-dup pairs with (lang,
    source) blocking — the bounded-quadratic ground truth the LSH
    methods approximate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        jaccard_pairs_blocked(docs, "doc_id", "text", ["lang", "source"], threshold=0.9)
        .orderBy("id_a", "id_b")
    )


_Q53_ORACLE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(0, greatest(len(w) - 3, 0) + 1),
               i -> array_to_string(w[i+1 : i+3], ' ')))) AS s
      FROM toks
    ),
    sz AS (SELECT doc_id, s, len(s) AS ln,
                  CAST(FLOOR(0.1 * len(s) + 1e-9) AS BIGINT) + 1 AS p
           FROM sh),
    pref AS (SELECT doc_id, ln, UNNEST(s[1 : p]) AS tok FROM sz),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.ln, b.ln) >= 0.9 * greatest(a.ln, b.ln) - 1e-9
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sz a ON c.id_a = a.doc_id JOIN sz b ON c.id_b = b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach (a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, MIN(b) AS group_id,
           TRUE AS lsh_recall_ok, TRUE AS lsh_precision_exact
    FROM reach GROUP BY a ORDER BY doc_id
    """


@query("q53_minhash_lsh_dedup", oracle=_Q53_ORACLE, tags=("llm", "dedup"))
def q53_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup groups under the driver's hard signal
    (VERDICT r12): the payload is the EXACT ground truth — connected
    components over the exact 3-gram-Jaccard ≥ 0.9 pair graph,
    computed in-plan by the prefix-filtering all-pairs join
    (:func:`jaccard_pairs_prefix`, recall 1.0 by construction) and
    reproduced by the oracle with DuckDB's native recursive CTE over
    the same prefix-filter twin. The LSH machinery (banded signature
    join → candidate pairs → exact verify) genuinely executes in-plan
    and folds into two deterministic booleans: ``lsh_recall_ok``
    (≥ 90% of the exact pairs found — seeded banding, deterministic)
    and ``lsh_precision_exact`` (zero false pairs — the exact-verify
    contract). Word 3-gram shingles (the C4/RefinedWeb-style choice):
    order-sensitive, so "same vocabulary" docs don't collapse into one
    quadratic near-dup clique the way unigram Jaccard does."""
    import math

    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_prefix

    docs = load_table(spark, sf_dir, "documents")
    exact = jaccard_pairs_prefix(
        docs, "doc_id", "text", threshold=0.9, shingle_n=3
    ).select("id_a", "id_b").persist()
    lsh = _swap_persist(
        "q53_lsh",
        minhash_lsh_pairs(
            docs, "doc_id", "text", jaccard_threshold=0.9, shingle_n=3
        ).select("id_a", "id_b"),
    )
    # r15 (guide §2.6): the exact prefix-join pipeline and the LSH
    # band pipeline are INDEPENDENT DAGs over the same corpus — only
    # the probe join consumes both. Materialize them as two concurrent
    # jobs instead of serially (first-run codegen + the two corpus
    # scans overlap); the probe then reads both caches.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f_exact = _pool.submit(exact.count)
        _f_lsh = _pool.submit(lsh.count)
        n_exact = _f_exact.result()
        _f_lsh.result()
    # one action derives BOTH counts (r14: the former inner-count +
    # anti-count pair executed the whole LSH pipeline twice); a left
    # join against the persisted exact pair set marks hits, and one
    # aggregate splits found vs extra
    probe = (
        lsh.join(
            exact.withColumn("_hit", F.lit(1)), ["id_a", "id_b"], "left"
        )
        .agg(
            F.count("_hit").alias("n_found"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias(
                "n_extra"
            ),
        )
        .first()
    )
    n_found = int(probe["n_found"])
    n_extra = int(probe["n_extra"] or 0)
    recall_ok = n_exact == 0 or n_found >= math.ceil(0.9 * n_exact)
    groups = dedup_connected_components(exact, docs.select("doc_id"), "doc_id")
    exact.unpersist()
    return groups.select(
        "doc_id",
        "group_id",
        F.lit(bool(recall_ok)).alias("lsh_recall_ok"),
        F.lit(n_extra == 0).alias("lsh_precision_exact"),
    ).orderBy("doc_id")


_Q386_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(0, greatest(len(w) - 3, 0) + 1),
               i -> array_to_string(w[i+1 : i+3], ' ')))) AS s
      FROM toks
    ),
    sz AS (SELECT doc_id, s, len(s) AS ln,
                  CAST(FLOOR(0.1 * len(s) + 1e-9) AS BIGINT) + 1 AS p
           FROM sh),
    pref AS (SELECT doc_id, ln, UNNEST(s[1 : p]) AS tok FROM sz),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
       AND least(a.ln, b.ln) >= 0.9 * greatest(a.ln, b.ln) - 1e-9
    )
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM cand c JOIN sz a ON c.id_a = a.doc_id JOIN sz b ON c.id_b = b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.9
    ORDER BY id_a, id_b
    """


@query("q386_minhash_lsh_pairs", oracle=_Q386_ORACLE, tags=("llm", "dedup"))
def q386_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH pipeline ALONE — banded signature join →
    candidate pairs → exact-Jaccard verify — with NO in-plan ground
    truth (VERDICT r12 item 6: q53 times both operators in one bench
    row, so a regression in either hides; this row isolates the LSH
    wall while q384 isolates the exact prefix join). The oracle is the
    exact prefix-filter pair set: exact-verify makes precision 1.0 by
    construction, and the seeded banding's recall is 1.0 on the driver
    corpora (measured at sf0.001/0.01/0.1 — q53's recall boolean keeps
    watching the ≥0.9 contract), so a banding regression that drops a
    true pair hash-mismatches loudly here. 100 TB shape: banded
    equi-join, never all-pairs (`operators/dedup.py:261`)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.9, shingle_n=3
    ).orderBy("id_a", "id_b")


_Q54_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / len(list_distinct(list_concat(a.w, b.w))) AS jaccard,
           TRUE AS near_identical_recall_ok, TRUE AS planted_dups_found
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
          / len(list_distinct(list_concat(a.w, b.w))) >= 0.97
    ORDER BY id_a, id_b
    """


@query("q54_simhash_near_dup", oracle=_Q54_ORACLE, tags=("llm", "dedup"))
def q54_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection under the driver's hard signal
    (VERDICT r12): 64-bit unigram SimHash signatures, 16-bit pigeonhole
    banding (any pair within Hamming 3 shares a band — the join is
    lossless, never a cross join), JVM bit_count verification. The
    machinery runs in-plan and folds into two deterministic booleans:
    ``near_identical_recall_ok`` — the Hamming ≤ 3 radius captures
    ≥ 90% of the NEAR-IDENTICAL ground truth (exact blocked unigram
    Jaccard ≥ 0.97, measured 100% at sf0.001/0.01/0.1; Hamming 3 of 64
    is deliberately tight, so 0.9-Jaccard pairs are NOT its contract) —
    and ``planted_dups_found`` — five exact clones planted into the
    corpus must all surface at Hamming 0. The payload is that exact
    ≥ 0.97 ground-truth pair set, hash-checked by the oracle."""
    import math

    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_blocked

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    base5 = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    planted = docs.select("doc_id", "text").unionByName(
        base5.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    sim = simhash_pairs(planted, "doc_id", "text", max_hamming=3).persist()
    plant_ids = [r["doc_id"] for r in base5.select("doc_id").collect()]
    found_clone = {
        (r["id_a"], r["id_b"])
        for r in sim.filter(F.col("id_b") >= 10_000_000).collect()
    }
    planted_found = all((i, i + 10_000_000) in found_clone for i in plant_ids)
    exact = jaccard_pairs_blocked(
        docs, "doc_id", "text", ["lang", "source"], threshold=0.97
    ).persist()
    n_exact = exact.count()
    n_found = (
        sim.filter(F.col("id_b") < 10_000_000)
        .select("id_a", "id_b")
        .join(exact.select("id_a", "id_b"), ["id_a", "id_b"], "inner")
        .count()
    )
    sim.unpersist()
    recall_ok = n_exact == 0 or n_found >= math.ceil(0.9 * n_exact)
    return exact.select(
        "id_a",
        "id_b",
        "jaccard",
        F.lit(bool(recall_ok)).alias("near_identical_recall_ok"),
        F.lit(bool(planted_found)).alias("planted_dups_found"),
    ).orderBy("id_a", "id_b")


@query(
    "q55_text_quality",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_m,
           len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_words,
           CAST(LENGTH(list_aggregate(regexp_split_to_array(trim(lower(text)), '\\s+'), 'string_agg', '')) AS DOUBLE)
             / len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS mean_word_len,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / LENGTH(text) AS punct_ratio,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
             / LENGTH(text) AS upper_ratio,
           CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w))) AS DOUBLE)
             / len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS stopword_ratio
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def q55_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring metrics per document (length, word stats,
    punctuation/uppercase/stopword ratios) — all codegen'd column ops."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_metrics(docs, "text").drop("text").orderBy("doc_id")


@query(
    "q56_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
           LENGTH(text) AS n_chars_m
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def q56_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_m"),
    ).orderBy("doc_id")


def _q57_oracle() -> str:
    """DuckDB twin of functions/text.py::language_id, generated from
    the same LANG_PROFILES so the two can never drift. Spark's
    array_max over (score, lang) structs and DuckDB's
    list_aggregate(..., 'max') share lexicographic struct comparison,
    so tie-breaks agree exactly."""
    from ent_fins_lakehouse_spark.functions.text import LANG_PROFILES

    entries = ",\n           ".join(
        "{'score': len(list_intersect(words, ["
        + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        + f"])), 'lang': '{lang}'}}"
        for lang in sorted(LANG_PROFILES)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, lang,
             list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang,
             list_aggregate([
           {entries}
             ], 'max') AS best
      FROM w
    )
    SELECT doc_id, lang, best.lang AS lang_pred, best.score AS lang_pred_score
    FROM s ORDER BY doc_id
    """


@query("q57_language_id", oracle=_q57_oracle(), tags=("llm", "text"))
def q57_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language identification (stopword-profile argmax)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return language_id(docs, "text").drop("text").orderBy("doc_id")


@query(
    "q58_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS cosine_sim
      FROM embeddings e, q
    )
    SELECT vec_id, cosine_sim FROM scored
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """,
    tags=("llm", "similarity"),
)
def q58_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 — JVM-side
    zip_with/aggregate dot product, TakeOrderedAndProject top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb, "embedding", list(qvec), k=10, id_col="vec_id")


def _exact_top10_oracle(*flags: str) -> str:
    """q58's exact-top-10 oracle with literal-TRUE invariant columns
    appended — the ANN tier's hard-signal shape (see
    :func:`_ann_exact_with_flags`)."""
    cols = "".join(f", TRUE AS {f}" for f in flags)
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS cosine_sim
      FROM embeddings e, q
    )
    SELECT vec_id, cosine_sim{cols} FROM scored
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """


def _ann_exact_with_flags(exact, id_col: str, flags) -> DataFrame:
    """The q141 sketch-beside-exact pattern applied to the ANN tier
    (VERDICT r11 item 1): the EXACT top-k is the hash-checkable
    payload, and each ``(name, ann_result, floor_hits)`` triple folds
    one deterministic boolean column into the plan — did the ANN
    plan's result contain at least ``floor_hits`` of the exact top-k
    ids (recall@k ≥ floor). The ANN machinery (seeded LSH / KMeans —
    deterministic given the data) genuinely executes inside this
    plan; a recall regression flips the boolean and the DuckDB
    oracle's literal TRUE hash-mismatches. 1-row broadcast crossJoins
    only — no payload perturbation, no extra shuffle."""
    out = exact
    for name, ann_ids, floor_hits in flags:
        hit = (
            exact.select(id_col)
            .join(ann_ids.select(id_col), id_col, "inner")
            .agg(F.count("*").alias("_n"))
            .select((F.col("_n") >= F.lit(int(floor_hits))).alias(name))
        )
        out = out.crossJoin(F.broadcast(hit))
    return out


@query(
    "q59_ann_lsh_topk",
    oracle=_exact_top10_oracle("lsh_recall_ok"),
    tags=("llm", "similarity"),
)
def q59_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH ANN under the driver's hard signal: the
    seeded LSH probe (4 tables) runs in-plan and its top-10 recall
    against the exact top-10 folds into ``lsh_recall_ok`` (floor 3/10
    — LSH trades recall for sublinear probes; the test floor). The
    payload rows are the exact ranking, hash-checked by the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    ann = ann_topk_lsh(emb, "embedding", qvec, k=10, id_col="vec_id")
    return _ann_exact_with_flags(exact, "vec_id", [("lsh_recall_ok", ann, 3)])


@query(
    "q60_ivf_topk",
    oracle=_exact_top10_oracle("ivf_recall_ok"),
    tags=("llm", "similarity"),
)
def q60_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (KMeans coarse quantizer, n_probe=4 of 8 cells) under
    the driver's hard signal: the probe's top-10 recall vs the exact
    top-10 folds into ``ivf_recall_ok`` (floor 5/10 — the test-suite
    floor for a 4/8-cell probe). Payload rows are the exact ranking,
    hash-checked by the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=8)
    ann = ivf_topk(
        indexed, centroids, "embedding", qvec, k=10, id_col="vec_id", n_probe=4
    )
    return _ann_exact_with_flags(exact, "vec_id", [("ivf_recall_ok", ann, 5)])


@query(
    "q61_multimodal_envelope",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q61_multimodal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal envelope construction: binary payload + typed
    metadata struct (mime, byte_len, md5 checksum)."""
    docs = load_table(spark, sf_dir, "documents")
    env = to_binary_column(docs, "text", "doc_id")
    return env.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("doc_id")


@query(
    "q62_multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum,
           CONCAT('fake-feat-', CAST(octet_length(encode(text)) % 7 AS VARCHAR)) AS feature
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q62_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature-extraction stage over binary payloads
    (deterministic fake featurizer — the decode step is stubbed, the
    Arrow batch plumbing is real). byte_mean is excluded from the
    oracle (Python float mean vs SQL decimal division differ in last
    bits) and validated in tests instead."""
    docs = load_table(spark, sf_dir, "documents")
    env = to_binary_column(docs, "text", "doc_id")
    return extract_features(env).select("doc_id", "byte_len", "checksum", "feature").orderBy("doc_id")


# Shared by q63 (exact per-pair fold) and q130 (BLAS selection + exact
# rescore) — same logical operator, two physical strategies, one truth.
_COSINE_TOP100_ORACLE = """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a,
           b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS cosine_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ORDER BY cosine_sim DESC, id_a, id_b LIMIT 100
    """


@query(
    "q63_embedding_near_dup",
    oracle=_COSINE_TOP100_ORACLE,
    tags=("llm", "similarity", "dedup"),
)
def q63_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: exact blocked all-pairs (block =
    label; at scale an IVF cluster / shard key), global top-100 most
    similar pairs. The thresholded variant is the same operator with
    ``min_cosine`` — top-N keeps the query meaningful on corpora with
    no high-cosine pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(
        emb, "vec_id", "embedding", block_cols=["label"], top_n=100
    )


@query(
    "q64_token_frequencies",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
      FROM documents WHERE trim(text) <> ''
    )
    SELECT token, COUNT(*) AS n
    FROM toks WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token LIMIT 50
    """,
    tags=("llm", "text"),
)
def q64_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: explode(tokens) → count → top-50.
    Physical shape at 100 TB: narrow explode, partial+final count on
    the token key (map-side combine collapses the Zipf head before the
    shuffle), TakeOrderedAndProject for the limit."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        F.explode(F.split(normalize_text("text"), " ")).alias("token")
    )
    return (
        toks.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


def _q65_oracle(
    k: int = 8,
    w: int = 6,
    min_shared: int = 3,
    max_doc_freq: float = 0.05,
    max_docs_per_fp: int = 256,
) -> str:
    """DuckDB twin of operators/dedup.py::winnow_fingerprints +
    winnow_overlap_pairs. The numpy kernel's uint64-wraparound
    polynomial hash is replicated exactly: the k power constants
    B^(k-1-j) mod 2^64 are precomputed in Python and emitted as
    HUGEINT literals, each k-gram hash is an 8-term
    byte-times-constant sum reduced mod 2^64 in int128 (max ~2^75,
    far inside HUGEINT), and the final value maps to the same signed
    BIGINT the kernel's .view(int64) produces. Valid because the
    corpus is ASCII (ascii(char) == utf-8 byte); window minima are
    taken on the UNSIGNED value like the kernel, then deduplicated."""
    B, M = 1_000_003, 1 << 64
    powers = [pow(B, k - 1 - j, M) for j in range(k)]
    hash_terms = " + ".join(
        f"CAST(ascii(substring(s, i + {j}, 1)) AS HUGEINT) * {p}"
        for j, p in enumerate(powers)
    )
    return f"""
    WITH norm AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, i, ({hash_terms}) % {M} AS h
      FROM norm, UNNEST(range(1, length(s) - {k} + 2)) AS t(i)
      WHERE length(s) >= {k}
    ),
    hlist AS (
      SELECT doc_id, list(h ORDER BY i) AS hs FROM grams GROUP BY doc_id
    ),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(hs) < {w} THEN [list_aggregate(hs, 'min')]
                  ELSE list_transform(range(1, len(hs) - {w} + 2),
                                      j -> list_aggregate(hs[j:j+{w - 1}], 'min'))
             END AS ms
      FROM hlist
    ),
    fps AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             CASE WHEN u >= {1 << 63} THEN CAST(u - {M} AS BIGINT)
                  ELSE CAST(u AS BIGINT) END AS fp
      FROM (SELECT doc_id, UNNEST(ms) AS u FROM mins)
    ),
    rare AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING COUNT(*) <= LEAST(GREATEST(
        CAST(FLOOR((SELECT COUNT(*) FROM documents) * {max_doc_freq}) AS BIGINT), 2),
        {max_docs_per_fp})
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM (SELECT * FROM fps JOIN rare USING (fp)) a
    JOIN (SELECT * FROM fps JOIN rare USING (fp)) b USING (fp)
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {min_shared}
    ORDER BY id_a, id_b
    """


@query("q65_winnow_overlap", oracle=_q65_oracle(), tags=("llm", "dedup"))
def q65_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint overlap: partial-overlap /
    containment candidates that whole-document MinHash misses
    (shared substrings ≥ k+window-1 chars guarantee a shared
    fingerprint). Oracle-checked since r11 — the uint64 polynomial
    hash is exactly replayable in SQL via precomputed mod-2^64 power
    constants and int128 intermediates (see ``_q65_oracle``); the
    winnowing guarantee itself stays unit-tested in
    tests/test_llm_ops.py."""
    from ent_fins_lakehouse_spark.operators.dedup import winnow_overlap_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        docs, "doc_id", "text", min_shared=3, k=8, window=6
    ).orderBy("id_a", "id_b")


@query(
    "q66_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(text) <> ''
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents WHERE trim(text) <> ''),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    ORDER BY doc_id, tfidf DESC, term
    """,
    tags=("llm", "text"),
)
def q66_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms, smoothed-IDF formula
    (tf · (ln((N+1)/(df+1)) + 1)), computed with explicit term
    identity (explode → tf → df broadcast-join → window rank) rather
    than ``HashingTF`` — hashing destroys the term column and its
    collisions break exactness. Shuffles: tf groupBy(doc,term), df
    groupBy(term) (broadcast back), final per-doc rank.

    The df (document-frequency) table has one row per distinct corpus
    token — tiny here, 10⁸–10⁹ rows on a real web corpus — so its
    broadcast hint is census-gated (``broadcast_if_small``): explicit
    broadcast while the vocabulary is provably small, plain join (AQE
    decides) beyond the cap. A *forced* hint at real vocab sizes would
    OOM rather than degrade.

    No driver-side actions beyond the (memoized) census: the
    normalizing constant N rides a 1-row broadcast cross join (q139's
    pattern). N counts non-blank documents on the narrow documents
    scan — every non-blank doc contributes ≥1 non-empty token, so this
    equals countDistinct(doc_id) over tf at a tiny fraction of the
    cost (one column of the doc table vs a distinct over the
    corpus-sized token matrix). tf stays persisted only until the next
    q66 invocation (swap-and-unpersist + atexit), so repeated
    bench/correctness runs hold at most one cached copy instead of
    accumulating until LRU eviction."""
    from pyspark.sql import Window as W
    from ent_fins_lakehouse_spark.operators.blocking import broadcast_if_small
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    # persisted: tf feeds the df aggregate, the consts aggregate and
    # the scored join — without the barrier the explode+groupBy
    # pipeline runs three times. Bounded: _swap_persist unpersists the
    # previous invocation's handle.
    tf = _swap_persist("q66_tf", toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    consts = docs.filter(F.trim("text") != "").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(broadcast_if_small(df_, tf, "term"), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "term",
            # rounded to 4dp: ln() is not correctly rounded and drifts
            # by 1 ulp between JVM and libm on some inputs — raw
            # doubles would flip rank-boundary ties and hash-mismatch
            # the oracle
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


@query(
    "q67_frame_sampling",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
    c AS (
      SELECT doc_id, blen,
             CAST(CEIL(blen / 64.0) AS BIGINT) AS n_chunks,
             CAST(CEIL(CAST(CEIL(blen / 64.0) AS DOUBLE) / 2) AS BIGINT) AS n_frames
      FROM b
    )
    SELECT doc_id, n_frames,
           -- kept chunks 0,2,4,…: all full (64B) except when the last
           -- kept chunk is also the final (ragged) chunk
           (n_frames - 1) * 64
             + CASE WHEN 2 * (n_frames - 1) = n_chunks - 1
                    THEN blen - (n_chunks - 1) * 64
                    ELSE 64 END AS frame_bytes
    FROM c ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def q67_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1→N mapInPandas): payload chunked into
    64-byte 'frames', every 2nd kept; per-doc frame count and byte
    totals hash-match the SQL arithmetic oracle — proving the fan-out
    row accounting, not just the happy path."""
    from ent_fins_lakehouse_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    env = to_binary_column(docs, "text", "doc_id")
    frames = sample_frames(env.select("doc_id", "payload"), chunk_bytes=64, every_nth=2)
    return (
        frames.groupBy("doc_id")
        .agg(F.count("*").alias("n_frames"), F.sum("frame_len").alias("frame_bytes"))
        .orderBy("doc_id")
    )


@query(
    "q68_corpus_cleaning_pipeline",
    oracle="""
    WITH m AS (
      SELECT doc_id, lang, text,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_words,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / LENGTH(text) AS punct_ratio,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                  w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w))) AS DOUBLE)
               / len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS stopword_ratio
      FROM documents
    ), clean AS (
      SELECT * FROM m
      WHERE n_words >= 30 AND stopword_ratio >= 0.05 AND punct_ratio <= 0.1
    ), deduped AS (
      SELECT MIN(doc_id) AS doc_id, ANY_VALUE(lang) AS lang, ANY_VALUE(n_words) AS n_words
      FROM clean
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    )
    SELECT lang, COUNT(*) AS n_docs,CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM deduped GROUP BY lang ORDER BY lang
    """,
    tags=("llm", "text", "dedup"),
)
def q68_corpus_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style cleaning pipeline as ONE composed plan: quality
    metrics (codegen column ops) → threshold filter → exact-fingerprint
    dedup (min-id survivor) → per-language accounting. One narrow map
    + two shuffles (dedup agg on the 32-byte digest, final lang agg) —
    the whole filter chain fuses into the scan at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    m = quality_metrics(docs.select("doc_id", "lang", "text"), "text")
    clean = m.filter(
        (F.col("n_words") >= 30)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("punct_ratio") <= 0.1)
    )
    deduped = (
        fingerprint(clean, "text")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.any_value("lang").alias("lang"),
            F.any_value("n_words").alias("n_words"),
        )
    )
    return (
        deduped.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_words").alias("total_words"))
        .orderBy("lang")
    )


@query(
    "q75_sentence_udtf",
    oracle="""
    WITH parts AS (
      SELECT doc_id, UNNEST(string_split(text, '. ')) AS sentence
      FROM documents
    )
    SELECT doc_id, COUNT(*) AS n_sentences,CAST(SUM(LENGTH(sentence)) AS BIGINT) AS sent_chars
    FROM parts WHERE sentence <> ''
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "text", "udtf"),
)
def q75_sentence_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) in a LATERAL join: one doc row in, one
    row per sentence out, aggregated back per doc — the table-function
    surface of SURVEY §2.10 (absent from the reference)."""
    from ent_fins_lakehouse_spark.functions.udxf import sentence_udtf

    spark.udtf.register("split_sentences", sentence_udtf())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS n_sentences, SUM(LENGTH(sentence)) AS sent_chars
        FROM docs_for_udtf, LATERAL split_sentences(text)
        GROUP BY doc_id ORDER BY doc_id
        """
    )


@query(
    "q92_pii_redaction",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example-' || (doc_id % 7) || '.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' AS raw
      FROM documents
    )
    SELECT doc_id,
           length(raw) AS raw_len,
           length(regexp_replace(regexp_replace(raw,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\\+?[0-9][0-9()\\-]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_len,
           CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
    FROM tagged ORDER BY doc_id
    """,
    tags=("llm", "text", "pii"),
)
def q92_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (the pre-training scrub pass): email + phone
    patterns replaced with typed placeholder tokens, JVM-side
    regexp_replace — no UDF in the hot path. The corpus is synthetic
    word-soup with no PII, so the query first injects deterministic
    contact strings derived from doc_id, making the redaction
    observable and oracle-checkable on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+?[0-9][0-9()\\-]{6,}[0-9]"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example-"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" today"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("raw"), email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return (
        docs.select("doc_id", raw.alias("raw"))
        .select(
            "doc_id",
            F.length("raw").alias("raw_len"),
            F.length(redacted).alias("redacted_len"),
            F.regexp_count("raw", F.lit(email_re)).alias("n_emails"),
        )
        .orderBy("doc_id")
    )


@query(
    "q93_corpus_mix",
    oracle="""
    WITH per AS (
      SELECT lang, source, COUNT(*) AS n_docs,CAST(SUM(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
    FROM per ORDER BY lang, source
    """,
    tags=("llm", "text", "agg"),
)
def q93_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report (the data-mixing dashboard for
    pre-training): docs + whitespace tokens per (lang, source) and each
    cell's share of total tokens — a grouped agg plus one unpartitioned
    window over the tiny aggregate (|langs|x|sources| rows, not the
    corpus), so the global-total window is safe at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = (
        F.length(F.trim("text"))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    per = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
    )
    total = W.partitionBy()
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total).cast("double")).alias(
            "token_share"
        ),
    ).orderBy("lang", "source")


@query(
    "q102_higher_order_arrays",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS pos_count,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 4) AS l1_norm,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm,
           round(list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0)[1], 4) AS scaled_first
    FROM embeddings
    WHERE vec_id % 37 = 0
    ORDER BY vec_id
    """,
    tags=("functions", "array", "higher-order"),
)
def q102_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function suite over the embedding column:
    ``filter`` (positive-component count), ``transform`` + ``aggregate``
    (L1 norm), ``zip_with`` (self dot product → L2 norm), and
    element_at on a transformed array. All lambda expressions execute
    JVM-side inside codegen — no Python UDF — which is the scale story
    for vector math over 100 TB of array<float> columns."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 37 == 0)
    v = F.transform("embedding", lambda x: x.cast("double"))
    zero = F.lit(0.0)
    l1 = F.aggregate(F.transform(v, lambda x: F.abs(x)), zero, lambda a, x: a + x)
    l2 = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b), zero, lambda a, x: a + x))
    return (
        emb.select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("pos_count"),
            F.round(l1, 4).alias("l1_norm"),
            F.round(l2, 4).alias("l2_norm"),
            F.round(F.element_at(F.transform(v, lambda x: x * 2.0), 1), 4).alias("scaled_first"),
        )
        .orderBy("vec_id")
    )


@query(
    "q103_posexplode_tokens",
    oracle="""
    WITH exploded AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos
      FROM documents
      WHERE doc_id % 151 = 0
    )
    SELECT doc_id, pos, word
    FROM exploded
    WHERE pos <= 5
    ORDER BY doc_id, pos
    """,
    tags=("functions", "array", "explode"),
)
def q103_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view) of the tokenized text — the
    first five tokens of each document with their 1-based position.
    ``posexplode`` fans out inside the same stage as the scan (no
    shuffle); DuckDB expresses it as unnest + generate_subscripts."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 151 == 0)
    return (
        docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .withColumn("pos", (F.col("pos0") + 1).cast("long"))
        .filter(F.col("pos") <= 5)
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos")
    )


@query(
    "q113_stratified_sample",
    oracle="""
    WITH bucketed AS (
      SELECT lang, n_chars,
             CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM bucketed
    WHERE bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("sample", "corpus-mix"),
)
def q113_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — per-language keep rates
    (downsample dominant 'en' to 10%, keep low-resource languages at
    50%), the corpus-rebalancing step of a training-data mix. Unlike
    ``sampleBy`` (seeded Bernoulli: partition-layout-dependent, not
    reproducible across engines or cluster sizes), the keep decision is
    a pure function of the document id via md5 bucketing — same rows
    everywhere, and the filter fuses into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(50))
    return (
        docs.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum(F.col("n_chars")).cast("long").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@query(
    "q114_repetition_filter",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents WHERE doc_id % 151 = 0
    ),
    big AS (
      SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      FROM tok
    )
    SELECT doc_id,
           CAST(COUNT(bg) AS BIGINT) AS n_bigrams,
           CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_distinct,
           round(1.0 - COUNT(DISTINCT bg) / CAST(COUNT(bg) AS DOUBLE), 4) AS dup_frac
    FROM big
    WHERE bg IS NOT NULL
    GROUP BY doc_id
    HAVING COUNT(bg) > 0
    ORDER BY doc_id
    """,
    tags=("text-quality", "dedup", "corpus"),
)
def q114_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition scoring (Rae et al. 2021 §A1.1: filter
    documents whose duplicate n-gram fraction is high — boilerplate and
    degenerate text): fraction of repeated word bigrams per document.
    The bigram list is built row-locally with slice+zip_with lambdas
    (whole-stage codegen; no explode, no shuffle, no Python) — the
    oracle needs an unnest + window to say the same thing. Per-doc
    arrays stay bounded, so this scales linearly with corpus size."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 151 == 0)
    bigrams = F.expr(
        "zip_with(slice(_toks, 1, size(_toks) - 1),"
        "         slice(_toks, 2, size(_toks) - 1),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    return (
        docs.withColumn("_toks", F.split("text", " "))
        .withColumn("_bg", bigrams)
        .filter(F.size("_bg") > 0)
        .select(
            "doc_id",
            F.size("_bg").cast("long").alias("n_bigrams"),
            F.size(F.array_distinct("_bg")).cast("long").alias("n_distinct"),
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("_bg")) / F.size("_bg").cast("double"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline, continued: benchmark decontamination, Gopher
# quality gating, and deterministic shard assignment — the three steps
# between "cleaned corpus" and "training shards" in an LLM data flow.
# ---------------------------------------------------------------------------


@query(
    "q127_decontamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(len(w) - 4),
                    i -> array_to_string(w[i+1:i+5], ' ')))) AS g
      FROM toks WHERE len(w) >= 5
    )
    SELECT t.doc_id AS doc_id, COUNT(DISTINCT t.g) AS n_contaminated_grams
    FROM grams t
    JOIN (SELECT DISTINCT g FROM grams WHERE source = 'src0') b ON t.g = b.g
    WHERE t.source <> 'src0'
    GROUP BY t.doc_id
    ORDER BY doc_id
    """,
    tags=("llm", "dedup", "decontamination"),
)
def q127_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / PaLM style):
    flag training documents sharing any word 5-gram with a held-out
    benchmark set (source='src0' stands in for the eval corpus).
    Physical plan: one shingle pass (JVM higher-order functions) →
    explode → the benchmark gram set is DISTINCT-reduced and
    broadcast — the training side never shuffles, which is the
    property that matters when the training side is 100 TB and the
    benchmark side is megabytes."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text, shingle_ngrams

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs = docs.filter(F.size(F.split(normalize_text("text"), " ")) >= 5)
    grams = shingle_ngrams(docs, "text", n=5).select(
        "doc_id", "source", F.explode("shingles").alias("g")
    )
    bench = grams.filter(F.col("source") == "src0").select("g").distinct()
    return (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_contaminated_grams"))
        .orderBy("doc_id")
    )


@query(
    "q128_gopher_quality_gate",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_words,
             CAST(LENGTH(list_aggregate(regexp_split_to_array(trim(lower(text)), '\\s+'), 'string_agg', '')) AS DOUBLE)
               / len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS mean_word_len,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / LENGTH(text) AS symbol_ratio,
             len(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w)))) AS n_stopwords
      FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, n_stopwords,
           (n_words BETWEEN 40 AND 100000)
             AND (mean_word_len BETWEEN 3 AND 10)
             AND symbol_ratio < 0.1
             AND n_stopwords >= 2 AS keep
    FROM m ORDER BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def q128_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021, §A1.1): word-count
    bounds, mean-word-length bounds, symbol ratio, and minimum distinct
    stopword evidence, combined into one boolean keep decision. All
    codegen'd column expressions — a full-corpus pass at 100 TB is one
    narrow scan with no shuffle (ORDER BY here is for the oracle
    comparison; production writes the flag back unsorted)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(words).cast("long")
    mean_wl = F.length(F.array_join(words, "")).cast("double") / n_words
    n_chars = F.length("text")
    symbol_ratio = (n_chars - F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))).cast(
        "double"
    ) / n_chars
    en_stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")])
    n_stop = F.size(F.array_distinct(F.filter(words, lambda w: F.array_contains(en_stop, w)))).cast("long")
    return (
        docs.select(
            "doc_id",
            n_words.alias("n_words"),
            mean_wl.alias("mean_word_len"),
            symbol_ratio.alias("symbol_ratio"),
            n_stop.alias("n_stopwords"),
        )
        .withColumn(
            "keep",
            F.col("n_words").between(40, 100000)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("symbol_ratio") < 0.1)
            & (F.col("n_stopwords") >= 2),
        )
        .orderBy("doc_id")
    )


@query(
    "q129_shard_assignment",
    oracle=f"""
    WITH s AS (
      SELECT CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard,
             len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
      FROM documents
    )
    SELECT shard, COUNT(*) AS n_docs,CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("llm", "text", "sharding"),
)
def q129_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: md5-bucket each
    document into one of 8 shards (engine-portable, reshuffle-stable —
    the same doc lands in the same shard on any engine or cluster
    size), with per-shard document and token accounting to verify
    balance. At scale this is the partitioning key for the final
    `write.partitionBy(shard)` of training data."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 8
    )
    return (
        docs.select(shard.alias("shard"), token_count("text").alias("n_tokens"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("shard")
    )


@query("q130_blockwise_cosine_topk", oracle=_COSINE_TOP100_ORACLE, tags=("llm", "similarity"))
def q130_blockwise_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The numpy scale path for q63: per-block all-pairs cosine as one
    BLAS matrix product inside applyInPandas (vs q63's per-pair
    codegen'd fold). Same logical result — the per-block cost drops
    from O(pairs × dim) interpreted expression evaluation to one
    O(n² × dim) dgemm per block, the right physical strategy when
    blocks are dense (IVF cells, near-dup buckets).

    ``rescore_exact``: dgemm selects the pairs, but its blocked
    summation drifts 1-3 ULPs from the sequential fold, so emitted
    cosines are recomputed with the exact codegen fold (the q138
    filter-then-rescore pattern) — making the result bit-identical to
    q63 and sharing its DuckDB oracle (VERDICT r10 item 4). Equality
    with q63 is also asserted in tests/test_llm_ops.py."""
    from ent_fins_lakehouse_spark.operators.similarity import cosine_pairs_blockwise_numpy

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blockwise_numpy(
        emb, "vec_id", "embedding", block_cols=["label"], top_n=100, rescore_exact=True
    )


@query(
    "q138_quantized_ann",
    oracle="""
    WITH q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    qq AS (SELECT qe, list_max(list_transform(qe, x -> abs(x))) / 127.0 AS qs FROM q0),
    qdq AS (SELECT qe, list_transform(qe, x -> floor(x / qs + 0.5) * qs) AS dqe FROM qq),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) > 0
    ),
    z AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e),
    dq AS (SELECT vec_id, v, list_transform(v, x -> floor(x / s + 0.5) * s) AS dv FROM z),
    approx AS (
      SELECT vec_id, v,
             list_dot_product(dv, dqe)
               / (sqrt(list_dot_product(dv, dv)) * sqrt(list_dot_product(dqe, dqe))) AS approx_sim
      FROM dq, qdq
    ),
    cand AS (SELECT * FROM approx ORDER BY approx_sim DESC, vec_id LIMIT 50)
    SELECT cand.vec_id, cand.approx_sim,
           list_dot_product(cand.v, q0.qe)
             / (sqrt(list_dot_product(cand.v, cand.v)) * sqrt(list_dot_product(q0.qe, q0.qe))) AS cosine_sim
    FROM cand, q0
    ORDER BY cosine_sim DESC, cand.vec_id LIMIT 10
    """,
    tags=("llm", "similarity"),
)
def q138_quantized_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized filter-then-rescore ANN (IVF-SQ8's SQ half):
    per-vector symmetric int8 quantization (~3.5x smaller hot column at
    scale), candidate scoring in the quantized domain, exact rescoring
    of the top-50 on full precision, exact top-10 out. Deterministic
    double arithmetic end to end - hash-checked against the DuckDB
    oracle, unlike sketch-based ANN."""
    from ent_fins_lakehouse_spark.operators.similarity import quantized_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return quantized_ann_topk(
        emb, "vec_id", "embedding", list(qvec), k=10, n_candidates=50
    )


@query(
    "q139_unigram_lm_quality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tc AS (SELECT term, COUNT(*) AS tf FROM t2 GROUP BY term),
    consts AS (
      SELECT (SELECT COUNT(*) FROM t2) AS n_tok, (SELECT COUNT(*) FROM tc) AS v
    ),
    lp AS (
      SELECT t2.doc_id,
             {det_quantize4_sql(det_ln_ratio_sql("tc.tf + 1", "consts.n_tok + consts.v"))} AS lpv4
      FROM t2 JOIN tc USING (term) CROSS JOIN consts
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           {det_mean4_sql("SUM(lpv4)", "COUNT(*)")} AS avg_logp
    FROM lp GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def q139_unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: train add-one-smoothed
    corpus unigram probabilities, score each document by mean token
    log-probability - the classic cheap LM-perplexity proxy used to
    rank web documents for training-data selection (CCNet-style, with
    the corpus itself as the LM). Per-token log-probs are rounded to
    4dp and summed in DECIMAL so the per-doc mean is order-insensitive
    and hash-exact vs the oracle (same discipline as q66's TF-IDF).

    Single lazy plan, zero driver-side actions: the normalizing
    constants (total tokens, vocab size) are a 1-row aggregate of the
    vocab table joined back via broadcast cross join (q143's pattern) —
    broadcasting ONE row is always safe; the vocab-sized tc table
    itself carries NO forced broadcast hint (10⁸–10⁹ distinct tokens on
    a real corpus would OOM a forced hint), so AQE /
    autoBroadcastJoinThreshold picks the tc-join strategy from actual
    sizes. The exploded token stream is never persisted (at 100 TB,
    caching it costs more than the extra narrow re-scan), but the
    VOCAB-sized tc table is (r14, q66's rule): unpersisted, the consts
    aggregate and the scored join each rebuilt tc's explode+groupBy
    subtree — THREE corpus explode passes for a two-pass algorithm.
    With tc persisted the corpus explodes exactly twice (tc build +
    scored's toks side). Locally neutral (interleaved A/B min 0.83 vs
    0.81 s — the corpus is tiny); the win is the removed full pass,
    which grows with the corpus."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tc = _swap_persist(
        "q139_tc", toks.groupBy("term").agg(F.count("*").alias("tf"))
    )
    # n_tok = Σ tf and v = |vocab| fall out of the (small) vocab table —
    # no second pass over the token stream for the constants
    consts = tc.agg(
        F.sum("tf").alias("n_tok"), F.count("*").alias("v")
    )
    # det_ln_ratio, not F.log: libm ln differs by 1 ulp between JVM and
    # DuckDB; and the whole score pipeline stays on the integer 1e-4
    # grid (det_quantize4 / det_mean4) because scale-4 double ROUND is
    # itself engine-divergent on x.xxxx5 ties — together these were the
    # r9 sf0.1 sweep's only failures
    lp4 = det_quantize4(
        det_ln_ratio(F.col("tf") + F.lit(1), F.col("n_tok") + F.col("v"))
    )
    scored = (
        toks.join(tc, "term")
        .crossJoin(F.broadcast(consts))
        .withColumn("lpv4", lp4)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            det_mean4(F.sum("lpv4"), F.count("*")).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@query(
    "q143_weighted_sample",
    oracle="""
    WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
    u AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 AS unif,
             CAST(n_chars AS DOUBLE) / CAST(mx.max_chars AS DOUBLE) AS w
      FROM documents, mx
    )
    SELECT doc_id, n_chars, ROUND(w, 6) AS weight
    FROM u WHERE unif < w ORDER BY doc_id
    """,
    tags=("llm", "sampling"),
)
def q143_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: keep each document
    with probability proportional to its quality weight (here
    n_chars / max(n_chars) - longer docs kept more often), decided by
    an md5-derived uniform per doc_id. Engine-portable and
    reshuffle-stable like q81's uniform sample: the same doc makes the
    same cut on any engine, cluster size, or rerun - a reproducibility
    property Bernoulli RNG sampling can't give a 100 TB pipeline. The
    max-weight normalizer stays in-plan via a broadcast cross join (no
    driver collect barrier)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wsamp"))), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )
    w = F.col("n_chars").cast("double") / F.col("max_chars").cast("double")
    return (
        docs.crossJoin(F.broadcast(mx))
        .withColumn("weight", F.round(w, 6))
        .withColumn("_u", unif)
        .filter(F.col("_u") < w)
        .select("doc_id", "n_chars", "weight")
        .orderBy("doc_id")
    )


class PartitionPruningError(RuntimeError):
    """The IVF cluster probe failed to reach the parquet scan as
    PartitionFilters — the serving layout's metadata-pruning contract
    is broken (every probe would scan the whole corpus)."""


def _require_partition_pruned(scan: DataFrame, partition_col: str) -> None:
    """Enforce (not just document) the serving-layout contract: the
    probe predicate must appear in the scan's PartitionFilters line.
    An explicit exception, not ``assert`` — the contract must survive
    ``python -O``."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    pruned = (
        "PartitionFilters" in plan
        and partition_col in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    )
    if not pruned:
        raise PartitionPruningError(
            f"cluster probe on {partition_col!r} did not prune partitions; "
            "plan follows:\n" + plan
        )


def _centroid_probe(centroids: list[list[float]], qvec: list[float], n_probe: int) -> list[int]:
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    return sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], qvec))[:n_probe]


def _dataset_fingerprint(sf_dir: str, table: str = "embeddings") -> str:
    """Content fingerprint of one dataset table for layout addressing:
    md5 over the dataset path PLUS each data file's (relpath, size,
    mtime_ns). Two sessions pointing at the same bytes share a layout;
    a rewritten dataset addresses a fresh one. Metadata-only — no data
    is read."""
    import hashlib
    import os

    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    target = os.path.join(sf_dir, f"{table}.parquet")
    entries: list[tuple] = []
    if os.path.isdir(target):
        for dp, _dn, fns in os.walk(target):
            for fn in fns:
                p = os.path.join(dp, fn)
                st = os.stat(p)
                entries.append(
                    (os.path.relpath(p, target), st.st_size, st.st_mtime_ns)
                )
    elif os.path.isfile(target):
        st = os.stat(target)
        entries.append((os.path.basename(target), st.st_size, st.st_mtime_ns))
    for e in sorted(entries):
        h.update(repr(e).encode())
    return h.hexdigest()[:16]


def _serving_layout(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    n_clusters: int,
    meta_name: str,
    build,
) -> tuple[str, object]:
    """Build-once / probe-MANY-SESSIONS ANN serving layout plumbing
    (VERDICT r11 item 4): the layout root is CONTENT-ADDRESSED —
    keyed by (dataset fingerprint, index params), no pid — so a second
    fresh session serves probes from the first session's build instead
    of rebuilding a 100 TB index per process.

    Concurrency contract (the r11 race, solved structurally instead of
    by pid isolation):
    - builds land in a pid-scratch dir and PUBLISH via one atomic
      os.rename — readers can never observe a half-built layout at the
      content address;
    - a rename loser discards its scratch and serves the winner's
      identical layout;
    - the shared root is NEVER removed at exit (the r11 cleanup race;
      cross-session amortization requires the layout to outlive the
      session) — content addressing bounds accumulation to distinct
      (dataset, params) pairs in the system tempdir;
    - if the content address is unusable (pre-existing invalid debris),
      the build falls back to serving from its pid scratch, which IS
      atexit-cleaned (the r11 behavior).

    ``build(data_path)`` writes the partitioned parquet layout and
    returns the JSON-serializable metadata (centroids / codebooks).
    Returns (data_path, metadata)."""
    import atexit
    import json
    import os
    import shutil
    import tempfile

    fp = _dataset_fingerprint(sf_dir)
    final_root = os.path.join(
        tempfile.gettempdir(), f"efl_{kind}_{fp}_k{n_clusters}"
    )

    def _load(root: str):
        meta = os.path.join(root, meta_name)
        data = os.path.join(root, "embeddings_by_cluster")
        if os.path.isfile(meta) and os.path.isfile(os.path.join(data, "_SUCCESS")):
            with open(meta, encoding="utf-8") as fh:
                return data, json.load(fh)
        return None

    got = _load(final_root)
    if got is not None:
        return got
    scratch = f"{final_root}.build_p{os.getpid()}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    meta_obj = build(os.path.join(scratch, "embeddings_by_cluster"))
    with open(os.path.join(scratch, meta_name), "w", encoding="utf-8") as fh:
        json.dump(meta_obj, fh)
    with open(os.path.join(scratch, "built_by.json"), "w", encoding="utf-8") as fh:
        json.dump({"pid": os.getpid(), "kind": kind, "fingerprint": fp}, fh)
    renamed = True
    try:
        os.rename(scratch, final_root)  # the atomic publish
    except OSError:
        renamed = False
    got = _load(final_root)
    if got is not None:
        if not renamed:
            shutil.rmtree(scratch, ignore_errors=True)  # lost the race
        return got
    if renamed:
        # published, but the validity probe declined (e.g. a cluster
        # config suppressing _SUCCESS markers): the build itself
        # succeeded and now lives at the content address — serve it
        # directly rather than pointing at the renamed-away scratch
        return os.path.join(final_root, "embeddings_by_cluster"), meta_obj
    # content address unusable — serve this process's scratch build
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    return os.path.join(scratch, "embeddings_by_cluster"), meta_obj


def _ivf_sq8_layout(spark: SparkSession, sf_dir: str, n_clusters: int = 8) -> tuple[str, list[list[float]]]:
    """Build-once / probe-many IVF-SQ8 serving layout.

    The embeddings table is written hive-partitioned by KMeans cluster
    id with BOTH the full-precision vector and its int8 quantization
    (qvec, qscale) as sibling columns; centroids are persisted beside
    it. The layout lives at a CONTENT-ADDRESSED path (dataset
    fingerprint + index params — see :func:`_serving_layout`) and is
    reused by every probe in every session pointing at the same data
    (index builds amortize across queries AND sessions in production —
    a 100 TB index is rebuilt on ingest cadence, not per process);
    delete the directory to force a rebuild. Returns
    (parquet_path, centroids)."""
    from ent_fins_lakehouse_spark.operators.similarity import quantize_int8

    def build(data_path: str):
        emb = load_table(spark, sf_dir, "embeddings")
        indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=n_clusters)
        qz = quantize_int8(indexed, "embedding")
        # zero vectors have no quantization scale (and no cosine): keep
        # the row (full-precision column stays complete) but null out
        # qvec so the quantized scorer skips it explicitly
        qz = qz.withColumn("qvec", F.when(F.col("qscale") > 0, F.col("qvec")))
        qz.write.mode("overwrite").partitionBy("ivf_cluster").parquet(data_path)
        return centroids

    return _serving_layout(
        spark, sf_dir, "ivf_sq8", n_clusters, "centroids.json", build
    )


@query(
    "q144_ivf_partitioned_serving",
    oracle=_exact_top10_oracle("ivf_serving_recall_ok"),
    tags=("llm", "similarity", "layout"),
)
def q144_ivf_partitioned_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving as a storage-layout problem: the IVF index (KMeans
    cluster assignment) is PERSISTED as a hive-partitioned layout
    (partitionBy(ivf_cluster)), and a probe query reads only the
    n_probe nearest clusters - enforced (explicit exception) to reach
    the scan as PartitionFilters, i.e. metadata-level pruning with
    zero bytes read from unprobed clusters. This is how a 100 TB
    vector corpus is actually served: the index is a partition key,
    not an in-memory structure, and every probe is a partition-pruned
    columnar scan (~n_probe/n_clusters of the table) + exact rescore.
    The layout is built once per dataset and reused across probes AND
    sessions (see :func:`_ivf_sq8_layout`).

    Hard signal (VERDICT r12): the pruned probe runs in-plan and its
    top-10 recall vs the exact top-10 folds into
    ``ivf_serving_recall_ok`` (floor 5/10, the 4/8-cell probe floor);
    payload rows are the exact ranking, hash-checked by the oracle."""
    from ent_fins_lakehouse_spark.operators.similarity import with_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    path, centroids = _ivf_sq8_layout(spark, sf_dir, n_clusters=8)
    probe = _centroid_probe(centroids, qvec, n_probe=4)
    scan = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    _require_partition_pruned(scan, "ivf_cluster")
    served = (
        with_cosine(scan, "embedding", qvec)
        .select("vec_id", "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    return _ann_exact_with_flags(
        exact, "vec_id", [("ivf_serving_recall_ok", served, 5)]
    )


@query(
    "q148_ivf_sq8_serving",
    oracle=_exact_top10_oracle("sq8_recall_ok", "rescore_tier_exact"),
    tags=("llm", "similarity", "layout"),
)
def q148_ivf_sq8_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-SQ8 serving — q138's quantized filter-then-
    rescore composed with q144's partition-pruned layout. The probe:

    1. rank centroids by cosine to the query, pick n_probe clusters
       (driver-side over the tiny persisted centroid list);
    2. partition-pruned scan of ONLY those clusters (PartitionFilters
       enforced — zero bytes from unprobed clusters), reading the
       ~3.5×-smaller int8 (qvec, qscale) columns, NOT the
       full-precision vectors — parquet is columnar, so the float
       column costs nothing until step 4;
    3. approximate scores in the quantized domain → top n_candidates;
    4. exact rescore of just those candidates on the full-precision
       column → exact top-k among survivors.

    At 100 TB this is the full production story: the index is a
    partition key (metadata pruning), the hot scan is the quantized
    column (I/O), and full floats are touched for ~50 rows per query.

    Hard signal (VERDICT r12): two deterministic booleans fold the
    serving invariants into the oracle-checked output —
    ``sq8_recall_ok`` (served top-10 recalls ≥ 5/10 of the exact
    global top-10) and ``rescore_tier_exact`` (the rescored top-10
    EQUALS the exact-over-probed-cells top-10 on (vec_id,
    round(cosine, 9)) — the 50-candidate quantized prefilter loses no
    ranking fidelity). Payload rows are the exact global ranking."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        _dot,
        _norm,
        dequantize,
        with_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    path, centroids = _ivf_sq8_layout(spark, sf_dir, n_clusters=8)
    probe = _centroid_probe(centroids, qvec, n_probe=4)
    scan = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    _require_partition_pruned(scan, "ivf_cluster")

    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    dv = dequantize("qvec", "qscale")
    approx = (_dot(dv, qlit) / (_norm(dv) * _norm(qlit))).alias("approx_sim")
    cand = (
        scan.filter(F.col("qvec").isNotNull())
        .select("vec_id", "embedding", approx)
        .orderBy(F.desc("approx_sim"), F.asc("vec_id"))
        .limit(50)
    )
    exact_cos = (
        _dot(F.col("embedding").cast("array<double>"), qlit)
        / (_norm(F.col("embedding").cast("array<double>")) * _norm(qlit))
    ).alias("cosine_sim")
    served = (
        cand.select("vec_id", exact_cos)
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )
    probed_exact = (
        with_cosine(scan, "embedding", qvec)
        .select("vec_id", "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )

    def _r9(df):
        return df.select("vec_id", F.round("cosine_sim", 9).alias("_c"))

    # lazy multiset equality — one evaluation per side instead of the
    # four the exceptAll pair paid (r14, guide §1.2)
    tier_eq = multiset_equal_col(
        _r9(served), _r9(probed_exact), "rescore_tier_exact"
    )
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    out = _ann_exact_with_flags(exact, "vec_id", [("sq8_recall_ok", served, 5)])
    return out.crossJoin(F.broadcast(tier_eq))


_Q151_ORACLE = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    nz AS (SELECT * FROM e WHERE list_dot_product(v, v) > 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS cosine_sim,
           TRUE AS cell_recall_ok
    FROM nz a JOIN nz b ON a.vec_id < b.vec_id
    ORDER BY cosine_sim DESC, id_a, id_b LIMIT 100
    """


@query(
    "q151_ivf_blocked_near_dup",
    oracle=_Q151_ORACLE,
    tags=("llm", "similarity", "dedup"),
)
def q151_ivf_blocked_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at production scale: the IVF coarse
    quantizer (q60/q144's KMeans) becomes the BLOCKING KEY for the
    BLAS blockwise exact-pair kernel (q130) — the composition that
    replaces label-blocking (q63) when no natural blocking key exists
    at 100 TB. KMeans partitions the corpus into bounded cells; each
    cell runs one n×d @ d×n dgemm inside applyInPandas; pairs never
    span cells, so total work is Σ nᵢ² over cells instead of N².

    Hard signal (VERDICT r12): the payload is the exact UNBLOCKED
    top-100 pair ranking (one-block BLAS + the codegen rescore fold —
    bit-identical to the oracle), and the cell-blocked pipeline runs
    in-plan with its overlap vs that exact top-100 folded into
    ``cell_recall_ok`` (floor 25/100 — the corpus is near-dup-sparse,
    so most of the top-100 is ~0.48-cosine background scattered across
    cells; the recall/throughput trade IS the point, and planted
    near-identical pairs co-locate — tests/test_llm_ops.py)."""
    import math

    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_pairs_blockwise_numpy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_pairs_blockwise_numpy(
        emb.withColumn("_all", F.lit(1)),
        "vec_id",
        "embedding",
        ["_all"],
        top_n=100,
        rescore_exact=True,
    )
    exact = _swap_persist("q151_exact", exact)
    indexed, _ = build_ivf_index(emb, "embedding", n_clusters=8)
    cell = cosine_pairs_blockwise_numpy(
        indexed, "vec_id", "embedding", ["ivf_cluster"], top_n=100
    )
    n_overlap = (
        cell.select("id_a", "id_b")
        .join(exact.select("id_a", "id_b"), ["id_a", "id_b"], "inner")
        .count()
    )
    return exact.select(
        "id_a",
        "id_b",
        "cosine_sim",
        F.lit(n_overlap >= 25).alias("cell_recall_ok"),
    ).orderBy(F.desc("cosine_sim"), "id_a", "id_b")


_Q157_ORACLE = """
    WITH RECURSIVE corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 50
    ),
    nz AS (SELECT * FROM corpus WHERE list_dot_product(v, v) > 0),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM nz a JOIN nz b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
            >= 0.95
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach (a, b) AS (
      SELECT vec_id, vec_id FROM corpus
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    lab AS (SELECT a AS vec_id, MIN(b) AS group_id FROM reach GROUP BY a)
    SELECT MIN(vec_id) AS vec_id, COUNT(*) AS n_members,
           TRUE AS cell_pipeline_equal, TRUE AS planted_grouped_ok
    FROM lab GROUP BY group_id ORDER BY vec_id
    """


@query(
    "q157_semantic_dedup",
    oracle=_Q157_ORACLE,
    tags=("llm", "dedup", "similarity"),
)
def q157_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) composed from the engine's own operators — the
    embedding-space analogue of the MinHash text pipeline (q53):

    1. candidate pairs from the IVF-cell-blocked BLAS kernel (q151's
       composition — bounded cells, no natural blocking key needed),
       thresholded at cosine ≥ 0.95 (near-identical content);
    2. connected components over the pair graph (driver union-find
       with asserted broadcast bound / distributed label-prop
       fallback);
    3. keep one canonical representative per component (min vec_id)
       plus every singleton.

    Hard signal (VERDICT r12): the fixture plants 50 exact clones
    (+1,000,000 ids — the q262 union construction, SQL-expressible),
    so the keep-list has real duplicate groups; the payload is the
    keep-list over the EXACT unblocked ≥ 0.95 pair graph (oracle:
    DuckDB all-pairs + native recursive-CTE components), and the
    cell-blocked pipeline runs in-plan with two folded booleans —
    ``cell_pipeline_equal`` (its keep-list EQUALS the exact one:
    identical vectors share a nearest centroid, so clone pairs never
    split across cells) and ``planted_grouped_ok`` (all 50 planted
    groups have ≥ 2 members)."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_pairs_blockwise_numpy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )

    def keep_list(pairs):
        groups = dedup_connected_components(
            pairs.select("id_a", "id_b"), corpus.select("vec_id"), "vec_id"
        )
        return (
            groups.groupBy("group_id")
            .agg(F.min("vec_id").alias("vec_id"), F.count("*").alias("n_members"))
            .select("vec_id", "n_members")
        )

    exact_pairs = cosine_pairs_blockwise_numpy(
        corpus.withColumn("_all", F.lit(1)),
        "vec_id",
        "embedding",
        ["_all"],
        min_cosine=0.95,
        rescore_exact=True,
    )
    exact_keep = _swap_persist("q157_exact_keep", keep_list(exact_pairs))
    indexed, _ = build_ivf_index(corpus, "embedding", n_clusters=8)
    cell_pairs = cosine_pairs_blockwise_numpy(
        indexed, "vec_id", "embedding", ["ivf_cluster"], min_cosine=0.95
    )
    cell_keep = keep_list(cell_pairs)
    # one evaluation of the unpersisted cell pipeline instead of two
    # (r14, guide §1.2); boolean below only cares about == 0
    n_diff = multiset_diff_count(cell_keep, exact_keep)
    n_groups = exact_keep.filter(F.col("n_members") >= 2).count()
    return exact_keep.select(
        "vec_id",
        "n_members",
        F.lit(n_diff == 0).alias("cell_pipeline_equal"),
        F.lit(n_groups >= 50).alias("planted_grouped_ok"),
    ).orderBy("vec_id")


@query(
    "q158_per_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rk <= 40
    ORDER BY doc_id
    """,
    tags=("llm", "sampling"),
)
def q158_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps — the corpus-balancing primitive that
    keeps one domain/language from dominating a training mix: at most
    K documents per group, chosen by a deterministic md5 shuffle
    (engine-portable and reshuffle-stable like q81/q143 — the same
    docs survive on any engine, cluster size, or rerun; a random
    ORDER BY rand() would not hash-match anything). One shuffle
    (partitionBy group), rank inside, filter — at 100 TB this is the
    standard windowed top-K-per-key shape with no skew beyond the
    group sizes themselves."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cap"))), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 40)
        .drop("rk")
        .orderBy("doc_id")
    )


@query(
    "q159_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(regexp_split_to_array(trim(text), ' ')) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ), c AS (
      SELECT doc_id, shard, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM t
    )
    SELECT doc_id, shard, n_tok,
           CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
    """,
    tags=("llm", "packing"),
)
def q159_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: assign documents to fixed
    token-budget training sequences (budget 512 here) by a running
    token total — the step that turns a curated corpus into the
    context-window-sized units a trainer actually consumes. Packing is
    SHARD-LOCAL (partitionBy shard, order within shard): a global
    ORDER BY would be a total sort of the corpus, while per-shard
    running sums are one partitioned window — the only formulation
    that survives 100 TB, and the one real pipelines use (shards are
    the unit of training-data shuffling anyway). Deterministic,
    hash-checked against the oracle's windowed running sum."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.trim("text"), " ")).alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t.withColumn("cum", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tok",
            F.floor((F.col("cum") - F.col("n_tok")) / F.lit(512.0)).alias("seq_id"),
        )
        .orderBy("doc_id")
    )


@query(
    "q160_bigram_lm_quality",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
      FROM documents WHERE trim(text) <> ''
    ),
    idx AS (
      SELECT doc_id, arr, UNNEST(generate_series(1, len(arr))) AS ord FROM s
    ),
    toks AS (SELECT doc_id, arr[ord] AS term, ord FROM idx),
    t2 AS (SELECT doc_id, term, ord FROM toks WHERE term <> ''),
    bi AS (
      SELECT doc_id, term,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY ord) AS next
      FROM t2
    ),
    b2 AS (SELECT doc_id, term, next FROM bi WHERE next IS NOT NULL),
    bc AS (SELECT term, next, COUNT(*) AS bf FROM b2 GROUP BY term, next),
    ctx AS (SELECT term, COUNT(*) AS cf FROM b2 GROUP BY term),
    v AS (SELECT COUNT(DISTINCT term) AS v FROM t2),
    lp AS (
      SELECT b2.doc_id,
             {det_quantize4_sql(det_ln_ratio_sql("bc.bf + 1", "ctx.cf + v.v"))} AS lpv4
      FROM b2 JOIN bc USING (term, next) JOIN ctx USING (term) CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           {det_mean4_sql("SUM(lpv4)", "COUNT(*)")} AS avg_logp
    FROM lp GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def q160_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality: add-one-smoothed corpus bigram
    probabilities P(w_i | w_{i-1}) = (c(w_{i-1}w_i)+1) / (c(w_{i-1}·)+V),
    per-document mean log-prob — one order up from q139's unigram
    proxy, sensitive to word-ORDER degeneracy (shuffled or
    template-stitched text scores low even when its unigram mix looks
    natural). Same hash-exactness discipline: 4dp-rounded log-probs
    summed in DECIMAL. Shuffles: bigram counts groupBy(term,next),
    context counts groupBy(term), per-doc groupBy(doc_id); the count
    tables carry no forced broadcast (census lesson from q66/q139 —
    AQE decides), and the 1-row vocab constant rides a broadcast cross
    join."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    wlead = W.partitionBy("doc_id").orderBy("pos")
    b2 = (
        toks.withColumn("next", F.lead("term").over(wlead))
        .filter(F.col("next").isNotNull())
        .select("doc_id", "term", "next")
    )
    bc = b2.groupBy("term", "next").agg(F.count("*").alias("bf"))
    # context counts FOLD from the bigram counts (r14, guide §1.2):
    # cf(term) = Σ bf over next — exact integers computed as a window
    # sum over the distinct-bigram relation, so bc evaluates ONCE (a
    # groupBy+self-join shape would duplicate its subtree) and the old
    # second full evaluation + full shuffle of b2 is gone
    v = toks.agg(F.countDistinct("term").alias("v"))
    cf = F.sum("bf").over(W.partitionBy("term"))
    # deterministic cross-engine log + integer-grid scoring (see q139)
    lp4 = det_quantize4(
        det_ln_ratio(F.col("bf") + F.lit(1), F.col("cf") + F.col("v"))
    )
    # score each DISTINCT bigram once, then one join attaches it to the
    # corpus — the old shape joined the full bigram relation twice
    # (by (term,next), then re-shuffled by term)
    lpt = (
        bc.withColumn("cf", cf)
        .crossJoin(F.broadcast(v))
        .select("term", "next", lp4.alias("lpv4"))
    )
    scored = b2.join(lpt, ["term", "next"])
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            det_mean4(F.sum("lpv4"), F.count("*")).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


@query(
    "q162_group_holdout_split",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN CAST(('0x' || substr(md5(source || ':holdout'), 1, 15)) AS BIGINT)
                     / 1152921504606846976.0 < 0.8
                THEN 'train' ELSE 'heldout' END AS split
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "sampling"),
)
def q162_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/heldout split: the split key is the SOURCE,
    not the document, so every document of a source lands on the same
    side — near-duplicates and templated pages within a domain cannot
    straddle the split and leak eval content into training (the
    group-wise holdout discipline behind every honest web-corpus
    eval). Same md5-uniform determinism as q81/q143: the assignment is
    engine-portable, reshuffle-stable, and reproducible from the key
    alone — no RNG state to version."""
    docs = load_table(spark, sf_dir, "documents")
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.col("source"), F.lit(":holdout"))), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.when(unif < 0.8, "train").otherwise("heldout").alias("split"),
        )
        .orderBy("doc_id")
    )


@query(
    "q163_source_quality_gate",
    oracle="""
    WITH m AS (
      SELECT source,
             AVG(CAST(n_chars AS DOUBLE)) AS mean_chars,
             COUNT(*) AS n_docs
      FROM documents GROUP BY source
    ),
    kept AS (SELECT source, mean_chars, n_docs FROM m WHERE mean_chars >= 280.0)
    SELECT d.doc_id, d.source, ROUND(k.mean_chars, 4) AS source_mean_chars
    FROM documents d JOIN kept k USING (source)
    ORDER BY d.doc_id
    """,
    tags=("llm", "quality"),
)
def q163_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level filtering (RefinedWeb-style): score each SOURCE by
    an aggregate quality signal (mean document length here — the same
    join shape carries any per-doc metric) and drop every document of
    a failing source — curation happens at the domain granularity
    where spam lives, not per page. Two shuffles: the per-source
    aggregate, then the join back; the aggregate side is one row per
    source, so AQE broadcasts it at any realistic source count (no
    forced hint, q66's census lesson)."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.avg(F.col("n_chars").cast("double")).alias("mean_chars")
    )
    kept = m.filter(F.col("mean_chars") >= 280.0)
    return (
        docs.join(kept, "source")
        .select(
            "doc_id",
            "source",
            F.round("mean_chars", 4).alias("source_mean_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "q174_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(text) <> ''
    ), toks2 AS (SELECT * FROM toks WHERE term <> ''),
    dlen AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
    consts AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dlen
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks2
      WHERE term IN ('spark', 'merge', 'window') GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ROUND(
               LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / c.avgdl)),
               4) AS s
      FROM tf JOIN df USING (term) JOIN dlen USING (doc_id) CROSS JOIN consts c
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(12,4))) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
      FROM agg
    )
    SELECT doc_id, bm25 FROM ranked WHERE rk <= 20 ORDER BY bm25 DESC, doc_id
    """,
    tags=("llm", "text", "retrieval"),
)
def q174_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Lucene's idf variant, k1=1.2 b=0.75) for
    the query "spark merge window" — the lexical-search complement of
    the embedding ANN family (q58/q59/q60): a real retrieval engine
    ranks with BOTH and fuses. Per-term scores are rounded to 4dp and
    summed in DECIMAL (the q66 discipline), ties break on doc_id, so
    the top-20 hash-matches the oracle exactly.

    Scale shape: the term filter lands BEFORE the tf aggregation, so
    the per-(doc,term) shuffle carries only docs containing query
    terms — corpus-size work is one doc-length aggregation (reusable
    index metadata in production) and the normalizing constants ride a
    1-row broadcast cross join. No driver-side actions at all."""
    docs = load_table(spark, sf_dir, "documents")
    agg = _bm25_scores(docs, ["spark", "merge", "window"])
    # top-k via sort-limit (TakeOrderedAndProject: per-partition heaps
    # + driver merge of k rows), NOT a global row_number window whose
    # single partition would funnel the corpus through one task
    return agg.orderBy(F.desc("bm25"), "doc_id").limit(20)


def _bm25_scores(docs: DataFrame, terms: list[str]) -> DataFrame:
    """``(doc_id, bm25)`` for every doc containing a query term —
    Lucene-variant BM25 (k1=1.2, b=0.75), per-term 4dp rounding +
    DECIMAL sum so scores are hash-exact vs a SQL oracle (q174/q177
    share this plan)."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    toks = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    # r14 (q139's rule): unpersisted, this plan re-ran the corpus
    # explode FOUR times — dlen, consts (via dlen), tf, df_ (via tf).
    # dlen is doc-sized and tf is term-filtered-tiny; persisting both
    # leaves exactly TWO explode passes (dlen build + tf build).
    # Locally neutral (interleaved A/B min 0.39 vs 0.36 s); the
    # removed passes grow with the corpus.
    dlen = _swap_persist(
        "bm25_dlen", toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    )
    consts = dlen.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    tf = _swap_persist(
        "bm25_tf",
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf")),
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.round(
                F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
                ),
                4,
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum(F.col("s").cast("decimal(12,4)")).cast("double").alias("bm25")
    )


@query(
    "q175_span_dedup_stats",
    oracle="""
    WITH arr AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS a
      FROM documents WHERE trim(text) <> ''
    ),
    w AS (
      SELECT doc_id, generate_subscripts(a, 1) - 1 AS widx, unnest(a) AS wd
      FROM arr
    ),
    ch AS (
      SELECT doc_id, CAST(FLOOR(widx / 10.0) AS BIGINT) AS cidx,
             md5(string_agg(wd, ' ' ORDER BY widx)) AS fp
      FROM w GROUP BY doc_id, CAST(FLOOR(widx / 10.0) AS BIGINT)
    ),
    freq AS (SELECT fp, COUNT(*) AS n FROM ch GROUP BY fp)
    SELECT ch.doc_id,
           COUNT(*) AS n_spans,CAST(SUM(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(SUM(CASE WHEN freq.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS dup_frac
    FROM ch JOIN freq USING (fp)
    GROUP BY ch.doc_id ORDER BY ch.doc_id
    """,
    tags=("llm", "dedup", "text"),
)
def q175_span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document SPAN dedup accounting (C4's three-sentence-span /
    RefinedWeb's line-level idea, word-chunk flavored for this corpus):
    each doc splits into consecutive 10-word spans, each span gets an
    md5 fingerprint, and a doc's duplication profile is the fraction
    of its spans whose fingerprint recurs ANYWHERE in the corpus —
    the signal that catches boilerplate and partial copies that
    whole-document dedup (q50/q51) is blind to.

    Scale shape: one posexplode (linear), one (doc, span) hash-groupBy,
    then ONE count window over the fingerprint key — every stage is a
    hash aggregation / windowed count on bounded keys; no pairwise
    comparison anywhere. r14: the corpus-wide fingerprint count was a
    separate groupBy joined back, which evaluated the whole
    posexplode+collect_list span pass TWICE (once per join side); the
    window computes n over the same single pass and shuffle
    (interleaved A/B at sf0.1: min 1.45 → 0.75 s, ~0.52×; plan 2 span
    subtrees → 1)."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.posexplode(F.split(normalize_text("text"), " ")).alias("widx", "wd"),
        )
    )
    ch = (
        w.withColumn("cidx", F.floor(F.col("widx") / 10.0))
        .groupBy("doc_id", "cidx")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("widx", "wd"))),
                        lambda s: s.wd,
                    ),
                    " ",
                )
            ).alias("fp")
        )
    )
    chn = ch.withColumn("n", F.count("*").over(W.partitionBy("fp")))
    dup = F.when(F.col("n") > 1, 1).otherwise(0)
    return (
        chn.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
            F.round(F.sum(dup).cast("double") / F.count("*"), 4).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q176_pq_ann",
    oracle=_exact_top10_oracle("pq_recall_ok"),
    tags=("llm", "similarity"),
)
def q176_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the compression tier beyond q138's
    scalar int8): 64-dim floats → 8 codes of 4 bits (64× smaller hot
    column) via per-subspace KMeans codebooks; queries score by
    Asymmetric Distance Computation — an m×k dot table embedded as
    array literals, summed JVM-side per row with zero Python in the
    scan — then the top-50 candidates exact-rescore on full precision.

    Hard signal (VERDICT r12): the ADC+rerank probe runs in-plan and
    its top-10 recall vs the exact top-10 folds into ``pq_recall_ok``
    (floor 5/10 at rerank=200 — measured 7-10/10 across
    sf0.001/0.01/0.1; the 4-bit codes are deliberately coarse, the
    rerank tier carries the precision). Payload rows are the exact
    ranking, hash-checked by the oracle."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    books = build_pq_codebooks(emb, "embedding", m=8, k=16)
    enc = pq_encode(emb.select("vec_id", "embedding"), "embedding", books)
    ann = pq_topk(
        enc, emb, books, "embedding", qvec, k=10, id_col="vec_id", rerank=200
    )
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    return _ann_exact_with_flags(exact, "vec_id", [("pq_recall_ok", ann, 5)])


@query(
    "q177_hybrid_rrf_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(text) <> ''
    ), toks2 AS (SELECT * FROM toks WHERE term <> ''),
    dlen AS (SELECT doc_id, COUNT(*) AS dl FROM toks2 GROUP BY doc_id),
    consts AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dlen
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks2
      WHERE term IN ('spark', 'merge', 'window') GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ROUND(
               LN(1.0 + (c.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / c.avgdl)),
               4) AS s
      FROM tf JOIN df USING (term) JOIN dlen USING (doc_id) CROSS JOIN consts c
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(12,4))) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id AS id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20
    ),
    q0 AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) > 0
    ),
    cos AS (
      SELECT vec_id,
             list_dot_product(v, qe)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qe, qe))) AS c
      FROM e, q0
    ),
    den AS (
      SELECT vec_id AS id, ROW_NUMBER() OVER (ORDER BY c DESC, vec_id) AS r
      FROM cos ORDER BY c DESC, vec_id LIMIT 20
    ),
    fused AS (
      SELECT COALESCE(lex.id, den.id) AS id,
             ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex.r), 0)
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + den.r), 0), 6) AS rrf
      FROM lex FULL OUTER JOIN den ON lex.id = den.id
    )
    SELECT id, rrf FROM fused ORDER BY rrf DESC, id LIMIT 10
    """,
    tags=("llm", "retrieval", "similarity"),
)
def q177_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID search — Reciprocal Rank Fusion (RRF, rrf_k=60) of the
    lexical BM25 ranking (q174's plan, shared helper) and the dense
    exact-cosine ranking over the corpus embeddings (vec_id indexes
    the same corpus as doc_id): each top-20 list contributes
    1/(60+rank), docs in both lists rise. This is how production
    retrieval actually ranks — sparse and dense signals fused rank-
    wise, immune to their incomparable score scales. Deterministic
    end-to-end (rank ties break on id; fused score rounded to 6dp)
    and hash-checked against the full SQL reconstruction.

    Scale shape: both branches end in sort-limit top-20s (per-
    partition heaps), the rank windows run over 20-row sets, and the
    fusion is a full outer join of two 20-row tables — corpus-size
    work stays in the two scoring branches."""
    from pyspark.sql import Window as W
    from ent_fins_lakehouse_spark.operators.similarity import with_cosine

    docs = load_table(spark, sf_dir, "documents")
    lex20 = (
        _bm25_scores(docs, ["spark", "merge", "window"])
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )
    lex = lex20.select(
        F.col("doc_id").alias("id"),
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))).alias("lr"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    import math

    nz = emb.filter(
        F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)) > 0
    )
    den20 = (
        with_cosine(nz, "embedding", qvec)
        .select("vec_id", "cosine_sim")
        .orderBy(F.desc("cosine_sim"), "vec_id")
        .limit(20)
    )
    den = den20.select(
        F.col("vec_id").alias("id"),
        F.row_number().over(W.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))).alias("dr"),
    )
    fused = (
        lex.join(den, "id", "full_outer")
        .select(
            "id",
            F.round(
                F.coalesce(F.lit(1.0) / (60 + F.col("lr")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (60 + F.col("dr")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "id").limit(10)


def _pagerank_oracle(iters: int) -> str:
    """Fixed-iteration PageRank as chained CTEs (DuckDB has no
    aggregate-in-recursive-CTE; unrolling the loop IS the oracle)."""
    sql = """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    bi AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT src, COUNT(*) AS d FROM bi GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM bi),
    pr0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes)
    """
    # FIXED-POINT iteration: ranks live in integer 10^-12 units and
    # every op is bigint add/multiply/floor-divide — engines cannot
    # diverge by even 1 ulp (double ROUND tie behavior differs between
    # DuckDB and the JVM; integers have no ties). 0.15 → 15e10 units,
    # damping 0.85·s → (85·s) div 100.
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (
      SELECT bi.dst AS node, SUM(p.r // deg.d) AS s
      FROM bi JOIN pr{i - 1} p ON p.node = bi.src JOIN deg ON deg.src = bi.src
      GROUP BY bi.dst
    ),
    pr{i} AS (
      SELECT n.node,
             150000000000 + (85 * COALESCE(c{i}.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
    )"""
    sql += (
        f"\n    SELECT node, CAST(r AS DOUBLE) / 1e12 AS pagerank"
        f" FROM pr{iters} ORDER BY node"
    )
    return sql


@query(
    "q178_pagerank",
    oracle=_pagerank_oracle(10),
    tags=("graph", "iterative"),
)
def q178_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trading graph (edges =
    distinct (customer, supplier) pairs through orders⨝lineitem, made
    bidirectional; supplier nodes offset by 10⁶) — the ITERATIVE
    dataflow class: 10 synchronous iterations of contribute-along-
    edges → aggregate → damp, each iteration one join + one shuffle
    on the node key. Ranks are FIXED-POINT integers (10⁻¹² units,
    floor division, damping as (85·s) div 100): float ROUND tie
    behavior differs between engines at ~1-in-10⁴ values and ten
    chained iterations amplify it, so the loop simply contains no
    floats — hash-exact vs the oracle's unrolled CTEs by
    construction.

    Scale shape: the classic Pregel-on-DataFrames loop — each
    iteration's ranks PERSIST and the previous iteration unpersists
    (bounded cache footprint, lineage cut), contributions shuffle once
    per iteration on dst, and the damping constants are literals. On a
    real cluster the edge table would be bucketed by src so every
    iteration's join is co-partitioned and shuffle-free."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    bi = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bi = bi.persist()
    deg = bi.groupBy("src").agg(F.count("*").alias("d"))
    nodes = bi.select(F.col("src").alias("node")).distinct()
    pr = nodes.select("node", F.lit(1000000000000).alias("r"))
    # fixed-point loop: bigint floor-division only, no floats — the
    # two engines cannot diverge (double ROUND ties differ; ints don't)
    for _ in range(10):
        contribs = (
            pr.join(bi, pr.node == bi.src)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("c"))
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        pr = nodes.join(sums, "node", "left").select(
            "node",
            F.expr("150000000000 + (85 * coalesce(s, 0)) div 100").alias("r"),
        )
        # localCheckpoint, not persist+count: persist leaves the full
        # logical lineage in place, so ten iterations nest every prior
        # plan and Catalyst's plan-string rendering alone OOMs a small
        # driver. localCheckpoint materializes eagerly AND replaces the
        # lineage with a LogicalRDD — plan size stays O(1) per
        # iteration, prior iterations' blocks release via GC. This is
        # the standard Pregel-style loop hygiene on Spark.
        pr = pr.localCheckpoint()
    bi.unpersist(blocking=False)
    return pr.select(
        "node", (F.col("r").cast("double") / F.lit(1e12)).alias("pagerank")
    ).orderBy("node")


def _ivf_pq_layout(
    spark: SparkSession, sf_dir: str, n_clusters: int = 8
) -> tuple[str, list[list[float]], list[list[list[float]]]]:
    """Build-once / probe-many IVF-PQ serving layout (q148's shape
    with the deeper compression tier): hive-partitioned by KMeans
    cluster id, rows carry the full-precision vector PLUS the 8×4-bit
    PQ codes and reconstructed norm; centroids and codebooks persist
    beside it. Content-addressed and cross-session reusable — see
    :func:`_serving_layout`. Returns (parquet_path, centroids,
    codebooks)."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_pq_codebooks,
        pq_encode,
    )

    def build(data_path: str):
        emb = load_table(spark, sf_dir, "embeddings")
        indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=n_clusters)
        books = build_pq_codebooks(emb, "embedding", m=8, k=16)
        enc = pq_encode(indexed, "embedding", books)
        # zero vectors have no cosine: null the codes so the ADC scorer
        # skips them explicitly (full-precision column stays complete)
        enc = enc.withColumn(
            "pq_codes", F.when(F.col("pq_norm") > 0, F.col("pq_codes"))
        )
        enc.write.mode("overwrite").partitionBy("ivf_cluster").parquet(data_path)
        return {"centroids": centroids, "books": books}

    path, m = _serving_layout(
        spark, sf_dir, "ivf_pq", n_clusters, "index.json", build
    )
    return path, m["centroids"], m["books"]


@query(
    "q188_ivf_pq_serving",
    oracle=_exact_top10_oracle("ivf_pq_recall_ok"),
    tags=("llm", "similarity", "layout"),
)
def q188_ivf_pq_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ serving — the deepest compression tier of the
    ANN family matrix (q60 IVF → q138 SQ8 → q148 IVF-SQ8 → q176 PQ →
    this): probe the n_probe nearest KMeans cells as a
    PartitionFilters-pruned scan (enforced — zero bytes from unprobed
    cells), ADC-score ONLY the 4-byte PQ codes column via JVM
    element_at lookups over the query's dot table (the 64×-smaller
    hot column; parquet is columnar, floats cost nothing yet), then
    exact-rescore the top-200 on full precision. At 100 TB: partition
    pruning handles the index, the scan streams 4-byte codes, and
    full floats are touched for ~200 rows per query.

    Hard signal (VERDICT r12): the full pruned-scan + ADC + rescore
    pipeline runs in-plan and its top-10 recall vs the exact top-10
    folds into ``ivf_pq_recall_ok`` (floor 5/10 — the IVF probe
    bounds recall; PQ only orders within probed cells, and the
    200-candidate rescore tier absorbs the 4-bit codes' coarseness on
    small corpora). Payload rows are the exact ranking, hash-checked
    by the oracle."""
    import math

    from ent_fins_lakehouse_spark.operators.similarity import _dot, _norm

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    path, centroids, books = _ivf_pq_layout(spark, sf_dir, n_clusters=8)
    probe = _centroid_probe(centroids, qvec, n_probe=4)
    scan = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    _require_partition_pruned(scan, "ivf_cluster")

    m, sub = len(books), len(books[0][0])
    qn = math.sqrt(sum(x * x for x in qvec)) or 1.0
    approx_dot = None
    for i in range(m):
        qi = qvec[i * sub : (i + 1) * sub]
        tab = F.array(
            *[F.lit(float(sum(a * b for a, b in zip(qi, c)))) for c in books[i]]
        )
        term = F.element_at(tab, F.col("pq_codes")[i] + 1)
        approx_dot = term if approx_dot is None else (approx_dot + term)
    cand = (
        scan.filter(F.col("pq_codes").isNotNull())
        .select(
            "vec_id",
            "embedding",
            (approx_dot / (F.lit(qn) * F.col("pq_norm"))).alias("approx_sim"),
        )
        .orderBy(F.desc("approx_sim"), F.asc("vec_id"))
        .limit(200)
    )
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact_cos = (
        _dot(F.col("embedding").cast("array<double>"), qlit)
        / (_norm(F.col("embedding").cast("array<double>")) * _norm(qlit))
    ).alias("cosine_sim")
    served = (
        cand.select("vec_id", exact_cos)
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )
    exact = cosine_topk(emb, "embedding", qvec, k=10, id_col="vec_id")
    return _ann_exact_with_flags(exact, "vec_id", [("ivf_pq_recall_ok", served, 5)])


@query(
    "q192_dsir_selection",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
      FROM documents WHERE trim(text) <> ''
    ),
    idx AS (
      SELECT doc_id, lang, arr, UNNEST(generate_series(1, len(arr))) AS ord FROM s
    ),
    toks AS (SELECT doc_id, lang, arr[ord] AS term, ord FROM idx WHERE arr[ord] <> ''),
    bi AS (
      SELECT doc_id, lang, term,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY ord) AS next
      FROM toks
    ),
    b2 AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(term || ' ' || next), 1, 15)) AS BIGINT) % 512
               AS bucket
      FROM bi WHERE next IS NOT NULL
    ),
    feat AS (SELECT doc_id, bucket, COUNT(*) AS c FROM b2 GROUP BY doc_id, bucket),
    tc AS (SELECT bucket, COUNT(*) AS tc FROM b2 WHERE lang = 'en' GROUP BY bucket),
    rc AS (SELECT bucket, COUNT(*) AS rc FROM b2 GROUP BY bucket),
    tot AS (
      SELECT (SELECT COUNT(*) FROM b2 WHERE lang = 'en') AS t_total,
             (SELECT COUNT(*) FROM b2) AS r_total
    ),
    lr AS (
      SELECT rc.bucket,
             CAST(ROUND(LN((CAST(COALESCE(tc.tc, 0) + 1 AS DOUBLE) / (tot.t_total + 512))
                           / (CAST(rc.rc + 1 AS DOUBLE) / (tot.r_total + 512))), 4)
                  AS DECIMAL(14,4)) AS lrv
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot
    ),
    score AS (
      SELECT feat.doc_id, CAST(SUM(feat.c * lr.lrv) AS DOUBLE) AS log_w
      FROM feat JOIN lr USING (bucket) GROUP BY feat.doc_id
    ),
    keyed AS (
      SELECT doc_id, ROUND(log_w, 4) AS log_w,
             ROUND(log_w - LN(-LN(
               CAST(('0x' || substr(md5(doc_id || ':dsir'), 1, 15)) AS BIGINT)
                 / 1152921504606846976.0)), 4) AS sel_key
      FROM score
    )
    SELECT doc_id, log_w, sel_key FROM keyed
    ORDER BY sel_key DESC, doc_id LIMIT 50
    """,
    tags=("llm", "sampling", "dedup-adjacent"),
)
def q192_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, 'Data Selection for
    Language Models via Importance Resampling'): hashed BIGRAM features
    (md5 → 512 buckets), add-one-smoothed bucket distributions for the
    TARGET domain (lang='en' as the in-domain proxy) and the RAW pool,
    per-document importance weight log w = Σ c_i·ln(p_i/q_i), then
    sampling WITHOUT replacement via the Gumbel top-k trick — here with
    DETERMINISTIC md5-uniform Gumbel noise (q162's idiom), so the draw
    is engine-portable and reproducible with no RNG state.

    Scale shape: the bucket distributions are ≤512-row aggregates
    (broadcast by AQE); the per-doc score is one groupBy(doc_id,bucket)
    + one groupBy(doc_id); selection is a sort-limit top-k. Nothing
    grows with corpus size except the two linear passes — the reason
    DSIR is THE importance-sampling method that runs at web scale.
    Hash-exactness: per-bucket log-ratios rounded 4dp into DECIMAL
    before the weighted sum (q160's discipline)."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    B = 512
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select(
            "doc_id",
            "lang",
            F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    wlead = W.partitionBy("doc_id").orderBy("pos")
    b2 = (
        toks.withColumn("next", F.lead("term").over(wlead))
        .filter(F.col("next").isNotNull())
        .select(
            "doc_id",
            "lang",
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(" ", "term", "next")), 1, 15), 16, 10
                ).cast("long")
                % B
            ).alias("bucket"),
        )
    )
    # ONE pass over the heavy explode+window relation (r14, guide
    # §1.2/§2.3): the per-(doc,bucket) partial aggregate carries the
    # in-domain count alongside, so tc/rc/tot all fold from this tiny
    # persisted relation instead of re-evaluating b2 (the old plan
    # evaluated the tokenize+lead subtree FOUR times). Integer-count
    # folding is exact, so the lrv doubles are unchanged.
    feat = _swap_persist(
        "q192_feat",
        b2.groupBy("doc_id", "bucket").agg(
            F.count("*").alias("c"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_en"),
        ),
    )
    bstats = feat.groupBy("bucket").agg(
        F.sum("c").alias("rc"), F.sum("c_en").alias("tc")
    )
    tot = feat.agg(
        F.sum("c_en").alias("t_total"), F.sum("c").alias("r_total")
    )
    lr = (
        bstats.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double") / (F.col("t_total") + B))
                    / ((F.col("rc") + 1).cast("double") / (F.col("r_total") + B))
                ),
                4,
            )
            .cast("decimal(14,4)")
            .alias("lrv"),
        )
    )
    score = (
        feat.join(lr, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lrv")).cast("double").alias("log_w"))
    )
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(":dsir"))), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )
    keyed = score.select(
        "doc_id",
        F.round("log_w", 4).alias("log_w"),
        F.round(F.col("log_w") - F.log(-F.log(unif)), 4).alias("sel_key"),
    )
    return keyed.orderBy(F.desc("sel_key"), "doc_id").limit(50)


@query(
    "q193_temperature_mixture",
    oracle="""
    WITH per AS (
      SELECT source,
             SUM(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)
               AS toks
      FROM documents GROUP BY source
    ),
    shares AS (
      SELECT source, toks,
             POW(CAST(toks AS DOUBLE) / SUM(toks) OVER (), 0.7) AS a
      FROM per
    ),
    rates AS (
      SELECT source, toks,
             ROUND(LEAST(1.0,
               0.5 * SUM(toks) OVER () * (a / SUM(a) OVER ()) / toks), 6) AS rate
      FROM shares
    )
    SELECT d.doc_id, d.source, r.rate
    FROM documents d JOIN rates r USING (source)
    WHERE CAST(('0x' || substr(md5(d.doc_id || ':tmix'), 1, 15)) AS BIGINT)
            / 1152921504606846976.0 < r.rate
    ORDER BY d.doc_id
    """,
    tags=("llm", "sampling"),
)
def q193_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the GPT-3/PaLM recipe for
    balancing heterogeneous sources): per-source token masses become
    α-smoothed sampling shares q_i ∝ p_i^0.7 — up-weighting small
    high-value sources without letting any source dominate — then each
    source gets acceptance rate min(1, budget·q_i/T_i) toward a 50%
    token budget, applied per-document by the md5-uniform coin (q143's
    determinism: same doc, same verdict, any engine or cluster).

    Scale shape: the rate table is |sources| rows (two tiny windows
    over it); docs join it on source — AQE broadcasts the rate side —
    and the filter is a map-side coin flip. One linear pass. Rates
    rounded 6dp BEFORE the coin so the accept decision itself is
    engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = (
        F.length(F.trim("text"))
        - F.length(F.replace(F.trim(F.col("text")), F.lit(" "), F.lit("")))
        + 1
    )
    per = docs.groupBy("source").agg(F.sum(n_tok).alias("toks"))
    everything = W.partitionBy()
    shares = per.select(
        "source",
        "toks",
        F.pow(F.col("toks").cast("double") / F.sum("toks").over(everything), 0.7).alias("a"),
    )
    rates = shares.select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.sum("toks").over(everything)
                * (F.col("a") / F.sum("a").over(everything))
                / F.col("toks"),
            ),
            6,
        ).alias("rate"),
    )
    unif = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(":tmix"))), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        docs.join(rates, "source")
        .filter(unif < F.col("rate"))
        .select("doc_id", "source", "rate")
        .orderBy("doc_id")
    )


@query(
    "q196_classifier_quality_gate",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             SUM(CAST(round(((j * 37 % 19) - 9) / 16.0
                            * CAST(embedding[j] AS DOUBLE), 4)
                      AS DECIMAL(18,4))) AS acc
      FROM embeddings, range(1, 65) AS t(j)
      GROUP BY vec_id
    ),
    scored AS (
      SELECT vec_id,
             CAST(acc AS DOUBLE) - 0.125 AS score
      FROM s
    )
    SELECT d.doc_id, d.source,
           round(score, 4) AS score,
           round(1.0 / (1.0 + exp(-score)), 4) AS p_keep
    FROM scored JOIN documents d ON d.doc_id = scored.vec_id
    WHERE score > 0
    ORDER BY d.doc_id
    """,
    tags=("llm", "quality", "similarity"),
)
def q196_classifier_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering over the embedding column — the
    fastText/DCLM-classifier pattern (score every doc with a trained
    linear head, keep what clears the gate) with FIXED, deterministic
    weights so the gate is exact-oracle-checkable (training belongs to
    q72's ML pipeline; serving-side scoring is the 100 TB operation).

    Spark shape: the dot product runs entirely in JVM codegen —
    ``zip_with`` (element-wise product) + ``aggregate`` (fold) over the
    64-dim array against a 64-literal weight vector; no UDF, no
    shuffle before the dim join. Hash-exactness discipline (q160):
    per-element products are rounded to 4dp and accumulated in
    DECIMAL(18,4) — order-insensitive, bit-identical across engines —
    and the keep decision (score > 0) is made on the exact DECIMAL,
    never on a float. At 100 TB this is one linear pass over the
    embedding column; the documents join is keyed on the same id the
    embeddings were produced from (AQE broadcasts the small side at
    test SF; co-partitioned ids at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    weights = [((j * 37 % 19) - 9) / 16.0 for j in range(1, 65)]
    w = F.array(*[F.lit(x) for x in weights])
    prod = F.zip_with(
        F.col("embedding"),
        w,
        lambda a, b: F.round(b * a.cast("double"), 4).cast("decimal(18,4)"),
    )
    acc = F.aggregate(
        prod,
        F.lit("0.0000").cast("decimal(18,4)"),
        lambda a, x: (a + x).cast("decimal(18,4)"),
    )
    scored = emb.select(
        "vec_id", (acc.cast("double") - F.lit(0.125)).alias("score_raw")
    ).filter(F.col("score_raw") > 0)
    return (
        scored.join(docs, scored.vec_id == docs.doc_id)
        .select(
            "doc_id",
            "source",
            F.round("score_raw", 4).alias("score"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score_raw"))), 4).alias(
                "p_keep"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "q199_passage_chunking",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    c AS (SELECT doc_id, words, len(words) AS n FROM w),
    idx AS (
      SELECT doc_id, words, n,
             unnest(range(0,
               GREATEST(CAST(ceil((n - 40) / 20.0) AS BIGINT), 0) + 1)) AS i
      FROM c
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(words[i*20 + 1 : i*20 + 40], ' ') AS chunk_text,
           CAST(LEAST(40, n - i*20) AS INT) AS n_words
    FROM idx ORDER BY doc_id, chunk_id
    """,
    tags=("llm", "chunking"),
)
def q199_passage_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window passage chunking — how long documents become
    retrieval passages / training windows (the RAG-ingest and
    FiD-style segmentation op): 40-word windows at a 20-word stride,
    so every token lands in ≤2 chunks and no boundary sentence is ever
    lost to a hard cut. A short doc yields exactly one chunk.

    Spark shape: whole-doc word split → per-doc chunk-index sequence →
    ``posexplode`` — a pure flatMap, NO shuffle, all JVM codegen
    (``sequence``/``slice``/``array_join``); the op is one linear pass
    whatever the corpus size, and chunk counts adapt per doc (no
    padding rows). The window arithmetic is integer-exact, so the
    DuckDB differential is hash-exact including the ragged tail
    chunk."""
    W_SIZE, STRIDE = 40, 20
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.trim("text") != "").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("words")
    )
    n = F.size("words")
    n_chunks = (
        F.greatest(
            F.ceil((n - W_SIZE).cast("double") / STRIDE).cast("int"), F.lit(0)
        )
        + 1
    )
    return (
        base.select(
            "doc_id",
            "words",
            n.alias("n"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice("words", F.col("chunk_id") * STRIDE + 1, W_SIZE), " "
            ).alias("chunk_text"),
            F.least(F.lit(W_SIZE), F.col("n") - F.col("chunk_id") * STRIDE)
            .cast("int")
            .alias("n_words"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "q203_fim_transform",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n,
             CAST(('0x' || substr(md5(doc_id || ':fimc'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 AS u0,
             CAST(('0x' || substr(md5(doc_id || ':fim1'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 AS u1,
             CAST(('0x' || substr(md5(doc_id || ':fim2'), 1, 15)) AS BIGINT)
               / 1152921504606846976.0 AS u2
      FROM documents WHERE trim(text) <> ''
    ),
    cuts AS (
      SELECT doc_id, text, n, u0 < 0.5 AS fim,
             LEAST(CAST(floor(u1 * n) AS INT), CAST(floor(u2 * n) AS INT)) AS lo,
             GREATEST(CAST(floor(u1 * n) AS INT), CAST(floor(u2 * n) AS INT)) AS hi
      FROM d
    )
    SELECT doc_id, fim,
           CASE WHEN fim THEN
             '<PRE>' || substr(text, 1, lo) ||
             '<SUF>' || substr(text, hi + 1) ||
             '<MID>' || substr(text, lo + 1, hi - lo)
           ELSE text END AS out_text
    FROM cuts ORDER BY doc_id
    """,
    tags=("llm", "augmentation"),
)
def q203_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022,
    arXiv:2207.14255 — the code-LLM pretraining augmentation): with
    probability 0.5 a document is rewritten PSM-style as
    ``<PRE>prefix<SUF>suffix<MID>middle`` over two uniform character
    cuts, teaching the model to infill; the rest pass through. All
    THREE random draws are the md5-uniform idiom (q143/q193): same doc
    → same coin, same cuts, on any engine, any partitioning, any rerun
    — the reproducibility every data-augmentation pipeline needs and
    RNG-per-task never gives. One linear map-only pass (substr/concat
    in JVM codegen, no shuffle, no UDF); the cut arithmetic is
    integer-exact so the transformed text is hash-identical to the
    DuckDB oracle character for character."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")

    def unif(salt: str):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(salt))), 1, 15),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            / F.lit(float(1 << 60))
        )

    n = F.length("text")
    c1 = F.floor(unif(":fim1") * n).cast("int")
    c2 = F.floor(unif(":fim2") * n).cast("int")
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    fim = unif(":fimc") < 0.5
    out_text = F.when(
        fim,
        F.concat(
            F.lit("<PRE>"),
            F.substring(F.col("text"), 1, lo),
            F.lit("<SUF>"),
            F.col("text").substr(hi + 1, F.length("text")),
            F.lit("<MID>"),
            F.col("text").substr(lo + 1, hi - lo),
        ),
    ).otherwise(F.col("text"))
    return docs.select(
        "doc_id", fim.alias("fim"), out_text.alias("out_text")
    ).orderBy("doc_id")


@query(
    "q204_mlm_masking",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    idx AS (
      SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w
    ),
    tok AS (
      SELECT doc_id, i, words[i] AS w,
             CAST(('0x' || substr(md5(doc_id || ':mlm:' || CAST(i - 1 AS VARCHAR)), 1, 15))
                  AS BIGINT) / 1152921504606846976.0 < 0.15 AS m
      FROM idx
    )
    SELECT doc_id,
           string_agg(CASE WHEN m THEN '<MASK>' ELSE w END, ' ' ORDER BY i) AS masked_text,
           COALESCE(string_agg(CASE WHEN m THEN w END, ' ' ORDER BY i), '') AS labels,
           CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
    FROM tok GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "augmentation"),
)
def q204_mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked-language-model corruption (the BERT pretraining
    objective): each word masks with probability 0.15 under a
    DETERMINISTIC per-(doc, position) md5 coin — same doc, same masks,
    on any engine / partitioning / rerun (q143's idiom at token
    granularity), which is what makes MLM data reproducible across
    pipeline re-executions. Output per doc: the masked text, the
    ordered label sequence, and the mask count.

    Spark shape: everything happens INSIDE the word array with
    higher-order functions — ``transform`` (with the position index
    feeding the coin) and ``filter`` — so the op is one map-only pass,
    no explode, NO shuffle, no UDF; the oracle unnests to rows and
    re-aggregates, proving the array formulation exact.

    r14: the words array and the md5-coin mask array are materialized
    ONCE through staged projections. The single-select form evaluated
    the split THREE times and the per-word md5 coin three times per
    row (masked_text, labels, n_masked each rebuilt it), and codegen
    subexpression elimination cannot merge them — lambda variables get
    fresh exprIds per ``transform``, so the subtrees are never
    syntactically equal. CollapseProject keeps the stages separate
    because each intermediate is non-cheap and referenced more than
    once downstream. Bit-exact (same expression tree per element,
    evaluated once); interleaved A/B at sf0.1: 1.81 → 1.45 s min
    (~0.80×). ``_at_parallelism`` on the input was measured and
    REJECTED (1.26 → 1.59 s — the round-robin shuffle of the text
    costs more than the freed cores return at this operator's
    compute density)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    words = F.split(F.trim("text"), r"\s+")

    def coin(i):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id"), F.lit(":mlm:"), i.cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            / F.lit(float(1 << 60))
            < 0.15
        )

    s1 = docs.select("doc_id", words.alias("_w"))
    s2 = s1.select(
        "doc_id", "_w", F.transform("_w", lambda w, i: coin(i)).alias("_m")
    )
    s3 = s2.select(
        "doc_id",
        F.zip_with(
            "_w", "_m", lambda w, m: F.when(m, F.lit("<MASK>")).otherwise(w)
        ).alias("_mk"),
        F.filter(
            F.zip_with("_w", "_m", lambda w, m: F.when(m, w)),
            lambda x: x.isNotNull(),
        ).alias("_lb"),
    )
    return s3.select(
        "doc_id",
        F.array_join("_mk", " ").alias("masked_text"),
        F.array_join("_lb", " ").alias("labels"),
        F.size("_lb").cast("long").alias("n_masked"),
    ).orderBy("doc_id")


@query(
    "q207_hard_negative_mining",
    oracle="""
    WITH e AS (
      SELECT d.doc_id, d.source, CAST(em.embedding AS DOUBLE[]) AS v
      FROM documents d JOIN embeddings em ON em.vec_id = d.doc_id
    ),
    anchors AS (SELECT * FROM e WHERE doc_id % 20 = 0),
    scored AS (
      SELECT a.doc_id AS anchor_id, c.doc_id AS neg_id,
             list_dot_product(a.v, c.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
               AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY a.doc_id
               ORDER BY list_dot_product(a.v, c.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                        c.doc_id
             ) AS rank
      FROM anchors a JOIN e c
        ON c.source <> a.source
    )
    SELECT anchor_id, neg_id, rank, cos_sim
    FROM scored WHERE rank <= 3
    ORDER BY anchor_id, rank
    """,
    tags=("llm", "similarity", "training-pairs"),
)
def q207_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval-model training (the DPR /
    contrastive-pairs op): for each anchor document, the top-3 most
    cosine-similar documents from a DIFFERENT source — near the anchor
    in embedding space but known-non-positive, the negatives that make
    contrastive training work (random negatives are too easy).

    Spark shape: anchors (5% of the corpus) broadcast against the
    candidate side; the dot product runs in JVM codegen
    (``zip_with``/``aggregate`` over the double-cast arrays — q58's
    kernel) and a per-anchor ROW_NUMBER window takes the top 3. Exact
    brute-force is the test-SF tier of the ANN matrix; at 100 TB the
    anchor probe routes through the IVF-partitioned layout
    (q60→q144→q148→q188) with this same query as the rescore step.
    Same-source pairs are excluded ON THE JOIN (never materialized)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "source", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    anchors = e.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_source"),
        F.col("v").alias("av"),
    )
    cand = e.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("c_source"),
        F.col("v").alias("cv"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        F.broadcast(anchors)
        .join(cand, F.col("c_source") != F.col("a_source"))
        .select(
            "anchor_id",
            "neg_id",
            (
                dot(F.col("av"), F.col("cv"))
                / (
                    F.sqrt(dot(F.col("av"), F.col("av")))
                    * F.sqrt(dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), "neg_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("anchor_id", "neg_id", F.col("rank").cast("long"), "cos_sim")
        .orderBy("anchor_id", "rank")
    )


@query(
    "q210_ccnet_bucketing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tc AS (SELECT term, COUNT(*) AS tf FROM t2 GROUP BY term),
    consts AS (
      SELECT (SELECT COUNT(*) FROM t2) AS n_tok, (SELECT COUNT(*) FROM tc) AS v
    ),
    lp AS (
      SELECT t2.doc_id,
             {det_quantize4_sql(det_ln_ratio_sql("tc.tf + 1", "consts.n_tok + consts.v"))} AS lpv4
      FROM t2 JOIN tc USING (term) CROSS JOIN consts
    ),
    scored AS (
      SELECT lp.doc_id, d.lang,
             CAST(round(CAST(SUM(lpv4) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg4
      FROM lp JOIN documents d USING (doc_id)
      GROUP BY lp.doc_id, d.lang
    ),
    hist AS (SELECT lang, avg4, COUNT(*) AS c FROM scored GROUP BY lang, avg4),
    cum AS (
      SELECT lang, avg4, c,
             SUM(c) OVER (PARTITION BY lang ORDER BY avg4 DESC) AS cum,
             SUM(c) OVER (PARTITION BY lang) AS n
      FROM hist
    ),
    cuts AS (
      SELECT lang,
             MAX(CASE WHEN cum >= CAST(CEIL(CAST(n AS DOUBLE) / 3.0) AS BIGINT)
                      THEN avg4 END) AS head4,
             MAX(CASE WHEN cum >= CAST(CEIL((2.0 * CAST(n AS DOUBLE)) / 3.0) AS BIGINT)
                      THEN avg4 END) AS mid4
      FROM cum GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.avg4 / 10000.0 AS avg_logp,
           CASE WHEN s.avg4 >= c.head4 THEN 'head'
                WHEN s.avg4 >= c.mid4 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c USING (lang)
    ORDER BY s.doc_id
    """,
    tags=("llm", "quality"),
)
def q210_ccnet_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the q139 unigram-LM proxy, then split each
    LANGUAGE's score distribution into head / middle / tail thirds —
    the standard web-corpus triage where 'head' feeds pretraining
    directly and 'tail' is dropped or re-filtered.

    Scale design: CCNet's per-language thirds are NOT computed with
    NTILE — a rank window partitioned by language is one reducer per
    language (5 languages -> 5 tasks sorting 20 TB each at target
    scale). Instead the cuts are exact DISCRETE order statistics
    (rank ceil(n/3) / ceil(2n/3) from the top) read off a per-language
    histogram of the 1e-4-quantized scores: the histogram groupBy is
    map-side combinable and its size is bounded by the score grid (a
    few hundred distinct values), so the cumulative-sum window runs
    over a tiny frame and the cuts broadcast back for a map-side
    comparison. Discrete cuts, not interpolated percentile: Spark's
    percentile and DuckDB's quantile_cont disagree by 1 ulp on tied
    order stats (measured), which flips >= at the cut; integer
    rank-vs-cumulative-count comparisons cannot. Scores ride the
    det_ln_ratio + det_quantize4 integer grid (see q139) end to end."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tc = toks.groupBy("term").agg(F.count("*").alias("tf"))
    consts = tc.agg(F.sum("tf").alias("n_tok"), F.count("*").alias("v"))
    lp4 = det_quantize4(
        det_ln_ratio(F.col("tf") + F.lit(1), F.col("n_tok") + F.col("v"))
    )
    scored = (
        toks.join(tc, "term")
        .crossJoin(F.broadcast(consts))
        .withColumn("lpv4", lp4)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("lpv4").cast("double") / F.count("*"), 0)
            .cast("bigint")
            .alias("avg4")
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    hist = scored.groupBy("lang", "avg4").agg(F.count("*").alias("c"))
    cum = hist.withColumn(
        "cum", F.sum("c").over(W.partitionBy("lang").orderBy(F.desc("avg4")))
    ).withColumn("n", F.sum("c").over(W.partitionBy("lang")))
    r_head = F.ceil(F.col("n").cast("double") / F.lit(3.0)).cast("bigint")
    r_mid = F.ceil((F.lit(2.0) * F.col("n").cast("double")) / F.lit(3.0)).cast("bigint")
    cuts = cum.groupBy("lang").agg(
        F.max(F.when(F.col("cum") >= r_head, F.col("avg4"))).alias("head4"),
        F.max(F.when(F.col("cum") >= r_mid, F.col("avg4"))).alias("mid4"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            (F.col("avg4") / F.lit(10000.0)).alias("avg_logp"),
            F.when(F.col("avg4") >= F.col("head4"), F.lit("head"))
            .when(F.col("avg4") >= F.col("mid4"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


@query(
    "q211_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos FROM (
        SELECT doc_id, UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term,
               UNNEST(generate_series(1, len(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')))) AS pos
        FROM documents WHERE trim(text) <> ''
      ) WHERE term <> ''
    ),
    big AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c_xy FROM big GROUP BY w1, w2),
    uc AS (SELECT term, COUNT(*) AS c_x FROM toks GROUP BY term),
    consts AS (
      SELECT (SELECT COUNT(*) FROM big) AS n_bi, (SELECT COUNT(*) FROM toks) AS n_uni
    )
    SELECT w1, w2, c_xy,
           ROUND(LN((CAST(c_xy AS DOUBLE) / n_bi)
                    / ((CAST(u1.c_x AS DOUBLE) / n_uni) * (CAST(u2.c_x AS DOUBLE) / n_uni))), 4) AS pmi
    FROM bc JOIN uc u1 ON bc.w1 = u1.term JOIN uc u2 ON bc.w2 = u2.term
    CROSS JOIN consts
    WHERE c_xy >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    tags=("llm", "text"),
)
def q211_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990): the top-50 adjacent word pairs whose co-occurrence most
    exceeds independence — the classic phrase/multi-word-expression
    extractor used to build tokenizer merge candidates and stop-phrase
    lists over a pretraining corpus.

    PMI = ln( P(xy) / (P(x)P(y)) ) with counts from one token stream:
    bigram counts, unigram counts (joined twice: left word, right
    word), and the two corpus totals as a 1-row broadcast cross join.
    A c_xy >= 5 support floor removes the noisy singleton tail BEFORE
    the unigram joins, so at 100 TB the joined bigram table is the
    (much smaller) repeated-pair set, not the raw O(corpus) stream;
    every join is a key-partitioned equi-join and the final top-50 is
    a global limit over a tiny ranked set. 4dp rounding keeps the log
    arithmetic hash-exact vs the oracle."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.trim("text") != "")
        .select(
            "doc_id",
            F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    wlead = W.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("w2", F.lead("term").over(wlead))
        .filter(F.col("w2").isNotNull())
        .select(F.col("term").alias("w1"), "w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("c_xy")).filter(F.col("c_xy") >= 5)
    uc = toks.groupBy("term").agg(F.count("*").alias("c_x"))
    consts = big.agg(F.count("*").alias("n_bi")).crossJoin(
        toks.agg(F.count("*").alias("n_uni"))
    )
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") / F.col("n_bi"))
            / (
                (F.col("u1_c").cast("double") / F.col("n_uni"))
                * (F.col("u2_c").cast("double") / F.col("n_uni"))
            )
        ),
        4,
    )
    return (
        bc.join(uc.select(F.col("term").alias("w1"), F.col("c_x").alias("u1_c")), "w1")
        .join(uc.select(F.col("term").alias("w2"), F.col("c_x").alias("u2_c")), "w2")
        .crossJoin(F.broadcast(consts))
        .select("w1", "w2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


@query(
    "q212_k_anonymity",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source,
             CAST(FLOOR(n_chars / 500) AS BIGINT) * 500 AS size_bucket
      FROM documents
    ),
    g AS (
      SELECT lang, source, size_bucket, COUNT(*) AS group_n
      FROM base GROUP BY lang, source, size_bucket
    )
    SELECT b.doc_id, b.lang,
           CASE WHEN g.group_n >= 5 THEN b.source ELSE '*' END AS source_anon,
           CASE WHEN g.group_n >= 5 THEN CAST(b.size_bucket AS VARCHAR) ELSE '*' END AS size_anon,
           g.group_n
    FROM base b JOIN g USING (lang, source, size_bucket)
    ORDER BY b.doc_id
    """,
    tags=("llm", "privacy"),
)
def q212_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression (Sweeney 2002) over quasi-identifiers
    (lang, source, 100-char size bucket): any combination shared by
    fewer than k=5 documents is generalized to '*' before release —
    the standard re-identification guard applied to training-corpus
    metadata exports alongside q92's in-text PII redaction.

    One hash aggregation over the quasi-identifier tuple produces the
    equivalence-class sizes; assignment is a key-partitioned join back
    (the class table is orders of magnitude smaller than the corpus —
    AQE broadcasts it when it fits, and the join stays an equi-shuffle
    when a high-cardinality identifier blows it up, which is exactly
    the failure mode a forced broadcast would OOM on). No windows, no
    sorts, two shuffles total at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        (F.floor(F.col("n_chars") / 500) * 500).alias("size_bucket"),
    )
    g = base.groupBy("lang", "source", "size_bucket").agg(F.count("*").alias("group_n"))
    keep = F.col("group_n") >= 5
    return (
        base.join(g, ["lang", "source", "size_bucket"])
        .select(
            "doc_id",
            "lang",
            F.when(keep, F.col("source")).otherwise(F.lit("*")).alias("source_anon"),
            F.when(keep, F.col("size_bucket").cast("string"))
            .otherwise(F.lit("*"))
            .alias("size_anon"),
            "group_n",
        )
        .orderBy("doc_id")
    )


@query(
    "q222_bpe_pair_stats",
    oracle="""
    WITH words AS (
      SELECT w FROM (
        SELECT UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) WHERE len(w) >= 2
    ),
    wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w),
    ipairs AS (
      SELECT w, cnt, UNNEST(generate_series(1, len(w) - 1)) AS i FROM wc
    )
    SELECT substring(w, CAST(i AS INT), 2) AS pair,CAST(SUM(cnt) AS BIGINT) AS freq
    FROM ipairs
    GROUP BY 1 ORDER BY freq DESC, pair LIMIT 30
    """,
    tags=("llm", "text", "tokenizer"),
)
def q222_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate statistics (Sennrich et al. 2016) — the
    inner counting step of tokenizer training, the formulation that
    scales: pairs are counted over DISTINCT words weighted by word
    frequency (the classic BPE trick), so the explode runs over the
    vocabulary (~10^5-10^6 rows even at 100 TB) instead of the raw
    token stream (~10^11) — the corpus-sized work is one word-count
    shuffle and everything after is vocabulary-sized. Adjacent-symbol
    extraction is a pure JVM higher-order expression (transform over
    sequence), no Python in the hot path; the top-30 is a global
    limit over a tiny ranked aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        wc.select(
            "cnt",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(30)
    )


@query(
    "q225_type_token_stats",
    oracle="""
    WITH toks AS (
      SELECT source, term FROM (
        SELECT source, UNNEST(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
        FROM documents
      ) WHERE term <> ''
    ),
    tc AS (SELECT source, term, COUNT(*) AS cnt FROM toks GROUP BY source, term)
    SELECT source,CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS ttr,
           ROUND(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_share
    FROM tc GROUP BY source ORDER BY source
    """,
    tags=("llm", "text", "quality"),
)
def q225_type_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity statistics per source — type-token ratio and
    hapax-legomena share, the standard corpus-health gauges (a
    machine-generated or boilerplate-heavy source shows collapsed TTR;
    an OCR-noise source shows inflated hapax share). One token-count
    shuffle keyed (source, term) — the same partial-agg shape as any
    word count, linear at 100 TB — then a source-level rollup;
    ratios rounded at 6dp in double on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        tc.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(
                F.col("n_types").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("ttr"),
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_types").cast("double"), 6
            ).alias("hapax_share"),
        )
        .orderBy("source")
    )


@query(
    "q226_l_diversity",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(FLOOR(n_chars / 256) AS BIGINT) AS len_bucket,
             COUNT(*) AS k_size,
             COUNT(DISTINCT source) AS l_div
      FROM documents GROUP BY 1, 2
    )
    SELECT lang, len_bucket, k_size, l_div,
           (k_size >= 3 AND l_div >= 2) AS releasable
    FROM g ORDER BY lang, len_bucket
    """,
    tags=("llm", "privacy"),
)
def q226_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) on top of q212's
    k-anonymity: a quasi-identifier group (lang, length bucket) is
    releasable only if it is BOTH large enough (k >= 3) and its
    sensitive attribute (source) takes >= 2 distinct values — k-anonymity
    alone leaks when a whole group shares one sensitive value
    (homogeneity attack). One grouped aggregation with a distinct count;
    at 100 TB this is the same shuffle as any multi-key group-by, and
    the distinct-count side can swap to approx_count_distinct when an
    estimate suffices."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang", F.floor(F.col("n_chars") / 256).alias("len_bucket")
        )
        .agg(
            F.count("*").alias("k_size"),
            F.countDistinct("source").alias("l_div"),
        )
        .select(
            "lang",
            "len_bucket",
            "k_size",
            "l_div",
            ((F.col("k_size") >= 3) & (F.col("l_div") >= 2)).alias("releasable"),
        )
        .orderBy("lang", "len_bucket")
    )


@query(
    "q227_incremental_dedup_index",
    oracle="""
    WITH u AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
             doc_id, source
      FROM documents WHERE doc_id < 300 OR doc_id >= 200
    ),
    win AS (
      SELECT digest, doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
      FROM u
    )
    SELECT digest, doc_id, source FROM win WHERE rn = 1 ORDER BY digest
    """,
    tags=("llm", "dedup", "incremental"),
)
def q227_incremental_dedup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch incremental dedup — the PERSISTED fingerprint index
    every continuously-ingesting corpus needs: each arriving batch is
    deduped within itself (min doc_id per digest), anti-joined against
    the index table of everything ever admitted, and only novel
    digests are appended. Batch 2 overlaps batch 1 by 100 documents;
    none of them may enter twice — a double-admit duplicates rows and
    hash-mismatches the oracle (which states the order-invariant
    equivalent: first-writer-wins == global min doc_id per digest,
    exactly because batch order and doc_id order agree on the overlap).

    At 100 TB the index is a digest-keyed Delta table; the anti-join
    is digest-partitioned (32-byte keys, not documents), and ingest
    cost is O(batch), never O(corpus) — the raw corpus is not
    rescanned."""
    from ent_fins_lakehouse_spark.operators.dedup import fingerprint
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    idx = DeltaLogTable(spark, tempfile.mkdtemp(prefix="dedup_idx_") + "/t")

    def ingest(batch: DataFrame) -> None:
        w = W.partitionBy("digest").orderBy("doc_id")
        batch_first = (
            fingerprint(batch, "text", out_col="digest")
            .select("digest", "doc_id", "source")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        novel = (
            batch_first.join(idx.read().select("digest"), "digest", "left_anti")
            if idx.exists()
            else batch_first
        )
        idx.write(novel, mode="append")

    ingest(docs.filter(F.col("doc_id") < 300))
    ingest(docs.filter(F.col("doc_id") >= 200))
    return idx.read().select("digest", "doc_id", "source").orderBy("digest")


#: MMR constants shared by the Spark path and the generated oracle.
_MMR_LAMBDA, _MMR_K, _MMR_POOL = 0.7, 10, 50


def _q224_oracle() -> str:
    """DuckDB twin of q224 — the k-step greedy unrolled as CTE pairs
    (ch{t}: the argmax row; st{t}: survivors with max-sim updated via
    the same sequential-fold dot product). Every float op mirrors the
    Spark/driver tree exactly (sequential list folds, GREATEST vs max,
    identical literal arithmetic), so the selection chain and emitted
    relevances are bit-identical."""
    lam = _MMR_LAMBDA
    score = f"(({lam} * rel) - ((1.0 - {lam}) * msim))"
    parts = [
        f"""
    WITH raw AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id <> 0 AND sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                  CAST(embedding AS DOUBLE[]))) > 0
    ),
    qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
    ),
    pool AS (
      SELECT r.vec_id, r.v,
             list_dot_product(r.v, q.v)
               / (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(q.v, q.v)))
               AS csim
      FROM raw r, qv q
      ORDER BY csim DESC, vec_id LIMIT {_MMR_POOL}
    ),
    qu AS (
      SELECT list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u FROM qv
    ),
    st0 AS MATERIALIZED (
      SELECT p.vec_id,
             list_transform(p.v, x -> x / sqrt(list_dot_product(p.v, p.v))) AS u,
             list_dot_product(list_transform(p.v, x -> x / sqrt(list_dot_product(p.v, p.v))), q.u) AS rel,
             0.0 AS msim
      FROM pool p, qu q
    )"""
    ]
    for t in range(1, _MMR_K + 1):
        parts.append(
            f""",
    ch{t} AS MATERIALIZED (
      SELECT vec_id, u, rel FROM st{t - 1}
      ORDER BY {score} DESC, vec_id LIMIT 1
    ),
    st{t} AS MATERIALIZED (
      SELECT s.vec_id, s.u, s.rel,
             GREATEST(s.msim, list_dot_product(s.u, c.u)) AS msim
      FROM st{t - 1} s, ch{t} c WHERE s.vec_id <> c.vec_id
    )"""
        )
    union = "\n    UNION ALL\n".join(
        f"    SELECT CAST({t - 1} AS INTEGER) AS rank, CAST(vec_id AS INTEGER) AS vec_id, rel AS relevance FROM ch{t}"
        for t in range(1, _MMR_K + 1)
    )
    return "".join(parts) + f"\n{union}\n    ORDER BY rank\n"


@query("q224_mmr_rerank", oracle=_q224_oracle(), tags=("llm", "similarity"))
def q224_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity-aware top-k every RAG retriever bolts onto a
    similarity search: greedily pick argmax of
    lambda*sim(query, d) - (1-lambda)*max_{s in S} sim(d, s).

    Two-tier shape (the only one that survives scale): the DISTRIBUTED
    exact top-50 candidate pool (one scan, broadcast query vector, JVM
    dot products), then the O(k*pool) greedy selection on the driver
    over the 50-row pool — bounded by construction, like every
    re-ranker.

    The bounded driver tier uses SEQUENTIAL float folds (the same
    left-fold order as Spark's aggregate/zip_with and DuckDB's
    list_dot_product — the q63-proven equivalence) rather than BLAS,
    so the greedy chain is engine-portable and the whole operator is
    oracle-checked against an unrolled k-step CTE twin (r11; rows-only
    before that). 50x64 sequential driver flops are noise next to the
    distributed candidate scan; the diversity invariant stays asserted
    in tests/test_llm_ops.py."""
    import math

    def sdot(a, b):  # the engines' shared left-fold order
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    pool_rows = cosine_topk(
        emb.filter(F.col("vec_id") != 0), "embedding", qvec, _MMR_POOL, "vec_id"
    ).collect()
    pool_ids = [r["vec_id"] for r in pool_rows]
    pool = (
        emb.filter(F.col("vec_id").isin(pool_ids))
        .select("vec_id", "embedding")
        .collect()
    )  # bounded: exactly the pool size, never O(corpus)
    qn = math.sqrt(sdot(qvec, qvec))
    qu = [x / qn for x in qvec]
    ids, U = [], []
    for r in pool:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sdot(v, v))
        ids.append(r["vec_id"])
        U.append([x / n for x in v])
    rel = [sdot(u, qu) for u in U]
    lam, k = _MMR_LAMBDA, _MMR_K
    chosen: list[int] = []
    cand = list(range(len(ids)))
    max_sim = [0.0] * len(ids)
    for _ in range(k):
        best = max(cand, key=lambda i: ((lam * rel[i]) - ((1.0 - lam) * max_sim[i]), -ids[i]))
        chosen.append(best)
        cand.remove(best)
        for i in cand:
            max_sim[i] = max(max_sim[i], sdot(U[i], U[best]))
    out = [(int(rank), int(ids[i]), float(rel[i])) for rank, i in enumerate(chosen)]
    return spark.createDataFrame(out, "rank INT, vec_id INT, relevance DOUBLE")


# DuckDB replay of the full BPE training loop (VERDICT r13 item 2):
# WITH RECURSIVE carries the ENTIRE weighted vocabulary as one
# list<struct> row; each recursive step computes the argmax pair from
# the working state via a LATERAL unnest + hash agg (freq DESC, l, r —
# the operator's exact tie-break) and rewrites the state with plain
# replace() over brace-delimited symbol strings, whose left-to-right
# non-overlapping scan IS the Sennrich merge semantics ('{a}{a}{a}' ->
# '{aa}{a}'). Fully SF-independent — no pinned literals; DuckDB
# re-derives every merge from the corpus, so a wrong pair count, tie
# break, or merge rewrite on the Spark side hash-mismatches.
_BPE_REPLAY_CTE = r"""
WITH RECURSIVE vocab0 AS (
  SELECT w, count(*)::BIGINT AS cnt,
         regexp_replace(w, '(.)', '{\1}', 'g') || '{</w>}' AS seq
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  )
  WHERE length(w) >= 2
  GROUP BY w
),
st AS (
  SELECT 0 AS it,
         (SELECT list(struct_pack(cnt := cnt, seq := seq)) FROM vocab0) AS vocab,
         CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r,
         CAST(NULL AS BIGINT) AS freq
  UNION ALL
  SELECT it + 1,
         list_transform(st.vocab, v -> struct_pack(
             cnt := v.cnt,
             seq := replace(v.seq, '{' || ch.l || '}{' || ch.r || '}',
                            '{' || ch.l || ch.r || '}'))),
         ch.l, ch.r, ch.freq
  FROM st, LATERAL (
    SELECT p.l, p.r, sum(p.cnt)::BIGINT AS freq
    FROM (
      SELECT syms[i] AS l, syms[i + 1] AS r, cnt
      FROM (
        SELECT u.v.cnt AS cnt, str_split(trim(u.v.seq, '{}'), '}{') AS syms
        FROM (SELECT unnest(st.vocab) AS v) u
      ) s, LATERAL unnest(generate_series(1, len(s.syms) - 1)) AS t(i)
    ) p
    GROUP BY p.l, p.r
    ORDER BY freq DESC, p.l, p.r
    LIMIT 1
  ) ch
  WHERE it < 12 AND ch.freq > 1
)
"""


@query("q229_bpe_train", oracle=_BPE_REPLAY_CTE + """
SELECT (it - 1)::INT AS rank, l AS "left", r AS "right", freq
FROM st WHERE it >= 1 ORDER BY rank
""", tags=("llm", "tokenizer"))
def q229_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016) — 12
    merge rules learned over the corpus: one corpus-sized word-count
    shuffle, then every iteration is vocabulary-sized (JVM pair
    explode + hash agg, a ONE-row driver collect for the argmax merge,
    an Arrow-batched rewrite of only the words containing the pair).
    State localCheckpoints between iterations so the loop doesn't
    stack lineage. Deterministic (ties break lexicographically);
    oracled by a DuckDB WITH RECURSIVE replay of the full loop (no
    pinned literals — DuckDB re-derives every merge from the corpus);
    tests/test_llm_ops.py additionally replays the exact Sennrich
    reference algorithm in pure Python and asserts rule-for-rule
    equality."""
    from ent_fins_lakehouse_spark.operators.tokenizer import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, 12)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["freq"]) for m in merges],
        "rank INT, left STRING, right STRING, freq LONG",
    ).orderBy("rank")


@query("q230_bpe_encode_stats", oracle=_BPE_REPLAY_CTE + """
, final_vocab AS (
  SELECT vocab FROM st ORDER BY it DESC LIMIT 1
),
enc AS (
  -- the training loop's final state IS encode-by-merge-rank over the
  -- distinct-word table: merges applied in rank order, left-to-right
  SELECT u.v.cnt AS cnt, str_split(trim(u.v.seq, '{}'), '}{') AS tokens
  FROM (SELECT unnest(vocab) AS v FROM final_vocab) u
),
tok AS (
  SELECT t.token, sum(e.cnt)::BIGINT AS freq
  FROM enc e, LATERAL unnest(e.tokens) AS t(token)
  GROUP BY t.token
),
top AS (
  SELECT token, freq FROM tok WHERE length(token) > 1
  ORDER BY freq DESC, token LIMIT 25
),
totals AS (
  SELECT '__TOTAL_TOKENS__' AS token, sum(cnt * len(tokens))::BIGINT AS freq
  FROM enc
)
SELECT * FROM (SELECT * FROM top UNION ALL SELECT * FROM totals)
ORDER BY token
""", tags=("llm", "tokenizer"))
def q230_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING at corpus scale — the trained merge table applied
    in rank order over the DISTINCT-word table only (one Arrow pass,
    ~vocabulary rows); corpus-level token statistics come from the
    frequency weights, the corpus text is never re-tokenized. Returns
    the top-25 learned tokens by corpus frequency plus a TOTALS row
    (corpus token count vs raw symbol count — the compression the 12
    merges bought). Deterministic; oracled by the DuckDB recursive
    replay's final state (training's last vocab IS encode-by-merge-rank
    over the distinct-word table); invariants (every token's corpus
    frequency ≥ its merge freq, totals shrink by exactly the merge
    freqs) are asserted in tests/test_llm_ops.py."""
    from ent_fins_lakehouse_spark.operators.tokenizer import (
        bpe_encode_vocab,
        bpe_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, 12)
    enc = bpe_encode_vocab(docs, merges)
    tok = (
        enc.select("cnt", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )
    top = (
        tok.filter(F.length("token") > 1)  # multi-char (learned) tokens
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(25)
        .select("token", "freq")
    )
    totals = enc.agg(
        F.sum(F.col("cnt") * F.size("tokens")).alias("freq")
    ).select(F.lit("__TOTAL_TOKENS__").alias("token"), "freq")
    return top.unionAll(totals).orderBy("token")


@query(
    "q232_curriculum_schedule",
    oracle="""
    WITH b AS (
      SELECT CAST(quantile_cont(n_chars, 0.25) AS DOUBLE) AS p25,
             CAST(quantile_cont(n_chars, 0.50) AS DOUBLE) AS p50,
             CAST(quantile_cont(n_chars, 0.75) AS DOUBLE) AS p75
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             (CASE WHEN n_chars > p25 THEN 1 ELSE 0 END
              + CASE WHEN n_chars > p50 THEN 1 ELSE 0 END
              + CASE WHEN n_chars > p75 THEN 1 ELSE 0 END) AS difficulty_bin,
             CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard,
             SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents CROSS JOIN b
    )
    SELECT doc_id, difficulty_bin, shard,
           ROW_NUMBER() OVER (
             PARTITION BY difficulty_bin, shard ORDER BY h, doc_id
           ) AS pos_in_shard
    FROM s ORDER BY difficulty_bin, shard, pos_in_shard
    """,
    tags=("llm", "curriculum"),
)
def q232_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data schedule (Bengio et al. 2009, as production
    pipelines run it): documents are quartile-binned by difficulty
    (length proxy; the quartile boundaries ride in-plan as a 1-row
    broadcast cross join), md5-shuffled WITHIN each bin for
    deterministic, engine-portable randomization, and positioned by a
    window partitioned on (bin, shard) — consumers stream shards in
    bin-major order to get easy→hard batches with stable shuffling
    across reruns and cluster sizes.

    The scale property: NO global sort anywhere — binning is a
    broadcast compare, the shuffle key is a hash, and the only window
    partitions on (bin, shard), so every partition is ~corpus/32 and
    the schedule materializes with one exchange."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(
        F.expr("percentile(n_chars, 0.25)").alias("p25"),
        F.expr("percentile(n_chars, 0.50)").alias("p50"),
        F.expr("percentile(n_chars, 0.75)").alias("p75"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    s = docs.crossJoin(F.broadcast(b)).select(
        "doc_id",
        (
            (F.col("n_chars") > F.col("p25")).cast("int")
            + (F.col("n_chars") > F.col("p50")).cast("int")
            + (F.col("n_chars") > F.col("p75")).cast("int")
        ).alias("difficulty_bin"),
        (F.conv(h, 16, 10).cast("long") % 8).alias("shard"),
        h.alias("h"),
    )
    w = W.partitionBy("difficulty_bin", "shard").orderBy("h", "doc_id")
    return (
        s.withColumn("pos_in_shard", F.row_number().over(w))
        .drop("h")
        .orderBy("difficulty_bin", "shard", "pos_in_shard")
    )


_Q262_ORACLE = """
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 50
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 7),
    scored AS (
      SELECT c.vec_id,
             list_dot_product(c.v, q.qe)
               / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qe, q.qe)))
               AS cosine_sim
      FROM corpus c, q
    )
    SELECT vec_id, cosine_sim,
           TRUE AS clone_cell_ok, TRUE AS clone_served_ok,
           TRUE AS clone_tie_ok, TRUE AS inc_recall_ok
    FROM scored
    ORDER BY cosine_sim DESC, vec_id LIMIT 10
    """


@query(
    "q262_ivf_incremental_append",
    oracle=_Q262_ORACLE,
    tags=("llm", "similarity", "layout"),
)
def q262_ivf_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL maintenance of the IVF serving layout (the gap
    between q188's build-once index and a live corpus): a new vector
    batch is assigned to the nearest EXISTING centroids
    (:func:`assign_ivf_clusters`, JVM-side — no retrain, no rebuild),
    PQ-encoded with the EXISTING codebooks, and appended into the
    hive-partitioned layout — so index maintenance costs O(batch), not
    O(corpus), and probes keep their PartitionFilters pruning
    (enforced). The fixture appends exact clones of the first 50
    vectors under new ids and probes with vector 7.

    Hard signal (VERDICT r12): the maintenance invariants fold into
    oracle-checked booleans — ``clone_cell_ok`` (clone 1000007 landed
    in vector 7's cell), ``clone_served_ok`` (the served top-2 is
    exactly {7, 1000007} — appended rows flow through the same pruned
    path), ``clone_tie_ok`` (clone cosine ties the original), and
    ``inc_recall_ok`` (served top-10 recalls ≥ 5/10 of the exact
    top-10 over the UNION corpus). Payload rows are that exact
    union-corpus ranking — fully SQL-expressible since the appended
    batch is a deterministic transform of the base table."""
    import math

    from ent_fins_lakehouse_spark.operators.similarity import (
        assign_ivf_clusters,
        build_ivf_index,
        build_pq_codebooks,
        pq_encode,
        _dot,
        _norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    import tempfile

    path = tempfile.mkdtemp(prefix="ivfinc_") + "/layout"
    indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=8)
    books = build_pq_codebooks(emb, "embedding", m=8, k=16)
    base = pq_encode(indexed, "embedding", books)
    base = base.withColumn(
        "pq_codes", F.when(F.col("pq_norm") > 0, F.col("pq_codes"))
    )
    base.write.mode("overwrite").partitionBy("ivf_cluster").parquet(path)

    # incremental batch: clones of the first 50 vectors, new ids —
    # assigned + encoded with the EXISTING index metadata, appended
    new = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    assigned = assign_ivf_clusters(new, "embedding", centroids)
    enc_new = pq_encode(assigned, "embedding", books)
    enc_new = enc_new.withColumn(
        "pq_codes", F.when(F.col("pq_norm") > 0, F.col("pq_codes"))
    )
    enc_new.write.mode("append").partitionBy("ivf_cluster").parquet(path)

    # a clone must share its original's cell (same centroids, same rows)
    cells = {
        r["vec_id"]: r["ivf_cluster"]
        for r in spark.read.parquet(path)
        .filter(F.col("vec_id").isin(7, 1_000_007))
        .select("vec_id", "ivf_cluster")
        .collect()
    }
    clone_cell_ok = cells.get(7) is not None and cells.get(7) == cells.get(1_000_007)

    qvec = list(emb.filter(F.col("vec_id") == 7).select("embedding").head()[0])

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / ((math.sqrt(sum(x * x for x in a)) or 1.0) * (math.sqrt(sum(x * x for x in b)) or 1.0))

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], qvec))
    probe = ranked[:4]
    scan = spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe))
    _require_partition_pruned(scan, "ivf_cluster")
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    served = (
        scan.select(
            "vec_id",
            (
                _dot(F.col("embedding").cast("array<double>"), qlit)
                / (_norm(F.col("embedding").cast("array<double>")) * _norm(qlit))
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
    )
    top = served.limit(2).collect()
    clone_served_ok = {r["vec_id"] for r in top} == {7, 1_000_007}
    clone_tie_ok = (
        len(top) == 2 and abs(top[0]["cosine_sim"] - top[1]["cosine_sim"]) <= 1e-9
    )
    # the exact ranking over the UNION corpus (base + appended clones)
    # — the SQL-expressible payload the oracle reproduces
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    exact = cosine_topk(corpus, "embedding", qvec, k=10, id_col="vec_id")
    out = _ann_exact_with_flags(exact, "vec_id", [("inc_recall_ok", served, 5)])
    return out.select(
        "vec_id",
        "cosine_sim",
        F.lit(bool(clone_cell_ok)).alias("clone_cell_ok"),
        F.lit(bool(clone_served_ok)).alias("clone_served_ok"),
        F.lit(bool(clone_tie_ok)).alias("clone_tie_ok"),
        "inc_recall_ok",
    )


@query(
    "q267_audio_segmentation",
    oracle="""
    WITH env AS (
      SELECT doc_id, octet_length(encode(text)) * 4 AS dur
      FROM documents
    ),
    seg AS (
      SELECT doc_id, dur,
             UNNEST(range(CAST(greatest(ceil(dur / 4000.0), 1) AS BIGINT))) AS seg_no
      FROM env
    )
    SELECT doc_id, seg_no,
           seg_no * 4000 AS start_ms,
           least(dur, seg_no * 4000 + 4000) AS end_ms,
           CAST((least(dur, seg_no * 4000 + 4000) - seg_no * 4000) // 4 AS BIGINT)
             AS seg_bytes
    FROM seg
    WHERE seg_no = 0 OR seg_no * 4000 < dur
    ORDER BY doc_id, seg_no
    """,
    tags=("llm", "multimodal"),
)
def q267_audio_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation over multimodal binary payloads — the ASR
    ingestion chunking stage, entirely in JVM codegen (sequence +
    explode + binary substring; the deterministic bytes→ms duration
    model stands in for a container-header read, the only piece a real
    decoder would replace): each payload splits into 4-second
    segments with exact time bounds and byte slices. 1→N explode is
    map-side (zero shuffle); segment counts are payload-proportional.
    The oracle reconstructs the full lattice arithmetically; slice
    CONTENT reassembly (concat of slices == original payload) is
    asserted in tests/test_llm_ops.py."""
    from ent_fins_lakehouse_spark.operators.multimodal import (
        segment_audio,
        to_binary_column,
    )

    docs = load_table(spark, sf_dir, "documents")
    env = to_binary_column(docs, "text", "doc_id")
    return (
        segment_audio(env.select("doc_id", "payload"), segment_ms=4000)
        .select(
            "doc_id",
            "seg_no",
            "start_ms",
            "end_ms",
            F.length("seg_payload").cast("long").alias("seg_bytes"),
        )
        .orderBy("doc_id", "seg_no")
    )


@query(
    "q286_per_source_reservoir_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':rsv'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, n_chars, rk
    FROM r WHERE rk <= 5
    ORDER BY source, rk
    """,
    tags=("llm", "sampling"),
)
def q286_per_source_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir sample — exactly k uniform
    docs per source with NO RNG state: each document's priority is
    md5(doc_id:salt) (the q162 engine-portable uniformity trick) and
    the k smallest per source win via one window rank. Distributed
    shape: one exchange on source, top-k per partition combines
    map-side — at 100 TB this is how eval/audit samples are drawn
    from a corpus without a global sort or a driver-side RNG, and the
    draw is reproducible from the keys alone (reshuffle-stable,
    engine-portable — the oracle reproduces it bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pri = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":rsv")))
    w = W.partitionBy("source").orderBy(pri, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", "n_chars", "rk")
        .orderBy("source", "rk")
    )


@query(
    "q287_weighted_systematic_resample",
    oracle="""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS cum,
             SUM(n_chars) OVER (PARTITION BY source) AS total
      FROM documents
    )
    SELECT doc_id, source, n_chars,CAST((cum * 20) // total - ((cum - n_chars) * 20) // total AS BIGINT) AS n_picks
    FROM c
    WHERE (cum * 20) // total > ((cum - n_chars) * 20) // total
    ORDER BY source, doc_id
    """,
    tags=("llm", "sampling"),
)
def q287_weighted_systematic_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SYSTEMATIC resampling per source (the particle-filter /
    mixture-construction draw): each document is picked
    ``floor(cum*k/total) - floor((cum-w)*k/total)`` times — exactly k
    slots per source, selection probability proportional to weight
    (n_chars), and every arithmetic step INTEGER (cumsum, scale by k,
    floor-divide by total) so the draw is bit-exact across engines —
    no float boundary can flip a pick. One window exchange on source;
    at 100 TB this replaces rejection/alias sampling for building
    token-budgeted mixtures: one pass, no RNG, deterministic
    restartability (the draw is a pure function of the snapshot)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w_cum = (
        W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    )
    w_tot = W.partitionBy("source")
    c = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sum("n_chars").over(w_cum).alias("cum"),
        F.sum("n_chars").over(w_tot).alias("total"),
    )
    hi = F.expr("(cum * 20) div total")
    lo = F.expr("((cum - n_chars) * 20) div total")
    return (
        c.withColumn("n_picks", hi - lo)
        .filter(hi > lo)
        .select("doc_id", "source", "n_chars", "n_picks")
        .orderBy("source", "doc_id")
    )


@query(
    "q288_boilerplate_shingle_density",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
             ws[i+3] || ' ' || ws[i+4] AS shingle
      FROM words, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
    ),
    df AS (
      SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle
    ),
    scored AS (
      SELECT s.doc_id,
             COUNT(*) AS n_shingles,CAST(SUM(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      FROM sh s JOIN df ON s.shingle = df.shingle
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_shingles, n_common,
           ROUND(CAST(n_common AS DOUBLE) / n_shingles, 6) AS common_frac,
           CAST(n_common * 10 >= n_shingles * 5 AS BOOLEAN) AS boilerplate_heavy
    FROM scored ORDER BY doc_id
    """,
    tags=("llm", "quality", "dedup"),
)
def q288_boilerplate_shingle_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate density scoring (the CCNet common-line filter
    re-expressed at shingle granularity for unstructured text): a
    document whose 5-gram shingles mostly also appear in ≥3 OTHER
    corpus documents is template/boilerplate-heavy (nav bars, legal
    footers, mirrored pages) and a dedup-resistant quality hazard for
    training. One explode pass builds per-doc DISTINCT shingles, one
    hash-agg computes corpus document frequency, one join back scores
    each doc by its common-shingle fraction; the heavy flag compares
    integers (n_common*10 >= n_shingles*5) so no float threshold can
    disagree across engines. At 100 TB every stage is a bounded
    hash-agg/equi-join on the shingle — the same sub-quadratic shape
    as MinHash banding, never doc×doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = docs.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.size("ws")
    sh = (
        ws.select(
            "doc_id",
            F.explode(
                # sub-5-word docs yield NO shingles: sequence(0, -1)
                # would be the DESCENDING [0, -1] (Spark defaults step
                # to -1 when start > stop) and slice would crash at
                # index 0 — guard with an empty lattice instead
                F.when(
                    n >= 5,
                    F.transform(
                        F.sequence(F.lit(0), n - 5),
                        lambda i: F.concat_ws(" ", F.slice("ws", i + 1, 5)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("shingle"),
        )
        .filter(F.col("shingle") != "")
        .distinct()
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    scored = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") >= 3, 1).otherwise(0)).alias("n_common"),
        )
    )
    return scored.select(
        "doc_id",
        "n_shingles",
        "n_common",
        F.round(F.col("n_common").cast("double") / F.col("n_shingles"), 6).alias(
            "common_frac"
        ),
        (F.col("n_common") * 10 >= F.col("n_shingles") * 5).alias(
            "boilerplate_heavy"
        ),
    ).orderBy("doc_id")


@query(
    "q291_unigram_entropy_quality",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT doc_id, word, COUNT(*) AS c
      FROM w WHERE word <> '' GROUP BY doc_id, word
    ),
    terms AS (
      SELECT doc_id,
             SUM(c) AS n,
             SUM(CAST(ROUND(c * log2(c), 4) AS DECIMAL(18,4))) AS clogc
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id,CAST(n AS BIGINT) AS n_words,
           ROUND(log2(CAST(n AS DOUBLE))
                 - CAST(clogc AS DOUBLE) / CAST(n AS DOUBLE), 4) AS entropy_bits,
           CAST(ROUND(log2(CAST(n AS DOUBLE))
                 - CAST(clogc AS DOUBLE) / CAST(n AS DOUBLE), 4) * 10000 >= 30000
                AS BOOLEAN) AS passes_gate
    FROM terms ORDER BY doc_id
    """,
    tags=("llm", "quality"),
)
def q291_unigram_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram ENTROPY — the information-density quality
    signal that catches what length/stopword heuristics miss:
    keyword-stuffed spam and template pages have low word entropy,
    natural prose is high. Computed with the numerically order-proof
    identity H = log2(n) − (Σ c·log2 c)/n over per-doc word counts,
    with each c·log2(c) term ROUNDED INTO DECIMAL before the sum —
    summation order cannot drift the hash across engines (the repo's
    float discipline). The gate compares scaled integers. One explode
    + two hash-aggs, all keyed on doc_id — a single exchange at any
    corpus size; composes with the Gopher gates (q114/q127 family) as
    another linear-pass column."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    terms = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(
            F.round(F.col("c") * F.log2("c"), 4).cast("decimal(18,4)")
        ).alias("clogc"),
    )
    ent = F.round(
        F.log2(F.col("n").cast("double"))
        - F.col("clogc").cast("double") / F.col("n").cast("double"),
        4,
    )
    return terms.select(
        "doc_id",
        F.col("n").alias("n_words"),
        ent.alias("entropy_bits"),
        ((ent * 10000).cast("long") >= 30000).alias("passes_gate"),
    ).orderBy("doc_id")


@query(
    "q295_sft_chat_format",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             '<|system|>' || chr(10) || 'You are a concise assistant.'
               || chr(10) || '<|user|>' || chr(10)
               || 'Summarize this ' || lang || ' document in one sentence.'
               || chr(10) || substring(text, 1, 200)
               || chr(10) || '<|assistant|>' || chr(10) AS prefix,
             text
      FROM documents
    ),
    t AS (
      SELECT doc_id,
             len(regexp_extract_all(prefix || text || '<|end|>', '{TOKEN_PATTERN}')) AS n_tokens_total,
             len(regexp_extract_all(prefix, '{TOKEN_PATTERN}')) AS n_tokens_prompt
      FROM r
    )
    SELECT doc_id, n_tokens_total, n_tokens_prompt,
           n_tokens_total - n_tokens_prompt AS n_tokens_label,
           n_tokens_total <= 512 AS fits_budget
    FROM t ORDER BY doc_id
    """,
    tags=("llm", "sft", "formatting"),
)
def q295_sft_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template rendering + loss-mask arithmetic — the
    formatting pass between curated documents and a supervised
    fine-tuning run: each document renders into a chat transcript
    (system/user/assistant markers), and the PROMPT-PREFIX token count
    is computed separately from the total so the trainer can mask the
    loss on everything before the assistant turn (the label-masking
    contract). Token counts use the engine's BPE-ish regex (q56's
    TOKEN_PATTERN) on BOTH engines, so the budget gate compares
    integers. One map-only JVM pass — concat/substring/regexp all
    codegen; no shuffle except the presentation sort. At 100 TB this
    is a pure scan-transform-write stage."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    nl = F.lit("\n")
    prefix = F.concat(
        F.lit("<|system|>"), nl, F.lit("You are a concise assistant."), nl,
        F.lit("<|user|>"), nl,
        F.lit("Summarize this "), F.col("lang"),
        F.lit(" document in one sentence."), nl,
        F.substring("text", 1, 200), nl,
        F.lit("<|assistant|>"), nl,
    )
    rendered = F.concat(prefix, F.col("text"), F.lit("<|end|>"))
    out = docs.select(
        "doc_id",
        token_count(rendered).alias("n_tokens_total"),
        token_count(prefix).alias("n_tokens_prompt"),
    )
    return out.select(
        "doc_id",
        "n_tokens_total",
        "n_tokens_prompt",
        (F.col("n_tokens_total") - F.col("n_tokens_prompt")).alias("n_tokens_label"),
        (F.col("n_tokens_total") <= 512).alias("fits_budget"),
    ).orderBy("doc_id")


@query(
    "q296_dpo_pair_mining",
    oracle="""
    WITH scored AS (
      SELECT source, lang, doc_id,
             CAST(floor(10000.0 * len(list_distinct(string_split(lower(text), ' ')))
                        / len(string_split(lower(text), ' '))) AS BIGINT) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT source, lang, doc_id, ttr,
             ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY ttr DESC, doc_id) AS rn_top,
             ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY ttr ASC, doc_id) AS rn_bot
      FROM scored
    )
    SELECT c.source, c.lang,
           c.doc_id AS chosen_doc, r.doc_id AS rejected_doc,
           c.ttr - r.ttr AS margin
    FROM ranked c JOIN ranked r
      ON c.source = r.source AND c.lang = r.lang
     AND c.rn_top = 1 AND r.rn_bot = 1
    WHERE c.doc_id <> r.doc_id AND c.ttr - r.ttr >= 500
    ORDER BY c.source, c.lang
    """,
    tags=("llm", "preference", "dpo"),
)
def q296_dpo_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for DPO/RLHF-style training: within each
    (source, lang) stratum the highest- and lowest-quality documents
    pair as chosen/rejected, gated on a minimum quality margin so
    near-tie pairs (no learning signal) drop. Quality is the
    type-token ratio as a SCALED INTEGER (floor(10000·distinct/total))
    so ranking and margin arithmetic are hash-exact across engines;
    ties break on doc_id for a deterministic pair. Two window
    functions over ONE (source, lang) exchange — at 100 TB this is a
    single shuffle keyed by stratum, never doc×doc."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    words = F.split(F.lower("text"), " ")
    scored = docs.select(
        "source",
        "lang",
        "doc_id",
        F.floor(
            10000.0 * F.size(F.array_distinct(words)) / F.size(words)
        ).cast("long").alias("ttr"),
    )
    w_top = W.partitionBy("source", "lang").orderBy(F.desc("ttr"), F.asc("doc_id"))
    w_bot = W.partitionBy("source", "lang").orderBy(F.asc("ttr"), F.asc("doc_id"))
    ranked = scored.select(
        "*",
        F.row_number().over(w_top).alias("rn_top"),
        F.row_number().over(w_bot).alias("rn_bot"),
    )
    c = ranked.filter("rn_top = 1").select(
        "source", "lang",
        F.col("doc_id").alias("chosen_doc"), F.col("ttr").alias("c_ttr"),
    )
    r = ranked.filter("rn_bot = 1").select(
        "source", "lang",
        F.col("doc_id").alias("rejected_doc"), F.col("ttr").alias("r_ttr"),
    )
    return (
        c.join(r, ["source", "lang"])
        .filter(
            (F.col("chosen_doc") != F.col("rejected_doc"))
            & ((F.col("c_ttr") - F.col("r_ttr")) >= 500)
        )
        .select(
            "source", "lang", "chosen_doc", "rejected_doc",
            (F.col("c_ttr") - F.col("r_ttr")).alias("margin"),
        )
        .orderBy("source", "lang")
    )


@query(
    "q314_zipf_law_fit",
    oracle="""
    WITH toks AS (
      SELECT UNNEST(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
      FROM documents WHERE trim(text) <> ''
    ),
    freq AS (
      SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
      GROUP BY token
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
      FROM freq
    ),
    pts AS (
      SELECT CAST(ROUND(LN(rank), 8) AS DECIMAL(14,8)) AS x,
             CAST(ROUND(LN(n), 8) AS DECIMAL(14,8)) AS y
      FROM ranked WHERE rank <= 500
    ),
    s AS (
      SELECT COUNT(*) AS m, SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT m AS n_ranks,
           ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                 / CAST(m * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
           ROUND((CAST(sy AS DOUBLE) - CAST(m * sxy - sx * sy AS DOUBLE)
                    / CAST(m * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(m AS DOUBLE), 6) AS log_intercept
    FROM s
    """,
    tags=("llm", "text", "stats"),
)
def q314_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus rank-frequency curve — the
    corpus-health diagnostic (natural text sits near slope −1;
    template/boilerplate-heavy or synthetic corpora bend it): OLS of
    log-frequency on log-rank over the top 500 ranks, the q250
    closed-form normal equations with q280's per-term
    DECIMAL-rounding so both engines sum identical exact terms in any
    order. Ranks come from ONE window over the VOCABULARY (bounded by
    distinct tokens, not corpus rows; tie-broken by token so rank
    assignment is total). The heavy part — explode + token count — is
    the same map-side-combining shape as q64; everything after runs on
    ≤ |vocab| rows."""
    from ent_fins_lakehouse_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.filter(F.trim("text") != "")
        .select(F.explode(F.split(normalize_text("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    ranked = freq.select(
        "n",
        F.row_number().over(W.orderBy(F.desc("n"), F.asc("token"))).alias("rank"),
    ).filter(F.col("rank") <= 500)
    pts = ranked.select(
        F.round(F.log("rank"), 8).cast("decimal(14,8)").alias("x"),
        F.round(F.log("n"), 8).cast("decimal(14,8)").alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        F.col("m").alias("n_ranks"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            6,
        ).alias("zipf_slope"),
        F.round(
            (
                F.col("sy").cast("double")
                - (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * F.col("sx").cast("double")
            )
            / F.col("m").cast("double"),
            6,
        ).alias("log_intercept"),
    )


@query(
    "q329_count_min_sketch",
    oracle="""
    WITH r AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cells AS (
      SELECT r.r,
             CAST(('0x' || substr(md5(CAST(e.user_id AS VARCHAR) || ':cms:' || CAST(r.r AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS cell,
             COUNT(*) AS n
      FROM events e CROSS JOIN r GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
    probe AS (
      SELECT k.user_id, r.r,
             CAST(('0x' || substr(md5(CAST(k.user_id AS VARCHAR) || ':cms:' || CAST(r.r AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS cell
      FROM keys k CROSS JOIN r
    ),
    est AS (
      SELECT p.user_id, CAST(MIN(c.n) AS BIGINT) AS cms_est
      FROM probe p JOIN cells c ON c.r = p.r AND c.cell = p.cell
      GROUP BY p.user_id
    ),
    truth AS (
      SELECT user_id, COUNT(*) AS true_n FROM events
      WHERE user_id % 97 = 0 GROUP BY user_id
    )
    SELECT e.user_id, t.true_n, e.cms_est
    FROM est e JOIN truth t ON t.user_id = e.user_id
    ORDER BY e.user_id
    """,
    tags=("sketch", "frequency", "streaming-adjacent"),
)
def q329_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    point-frequency sketch that completes the engine's sketch shelf
    (HLL distinct q218, KMV set algebra q244, KLL-style quantiles
    q223, heavy hitters q228): depth 4 × width 256 counters under
    deterministic md5 row-hashes; estimate(k) = min over rows of the
    cell k hashes to — always ≥ the true count, within εN with high
    probability.

    The defining algebraic property is proven in-plan: sketch(half A)
    + sketch(half B) merged CELL-WISE equals sketch(all) exactly —
    what makes CMS a distributed/streaming structure (per-partition
    partial sketches sum into the global one; a 100 TB build is one
    map-side-combined 1024-cell agg, KBs of state). Probes for the
    deterministic key set return (true count, estimate) side by side,
    hash-checked against the oracle computing the identical cells in
    SQL."""
    ev = load_table(spark, sf_dir, "events")
    rs = spark.range(4).select(F.col("id").cast("int").alias("r"))

    def cell_of(key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            key_col.cast("string"),
                            F.lit(":cms:"),
                            F.col("r").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 256
        )

    def sketch(df):
        return (
            df.crossJoin(F.broadcast(rs))
            .select("r", cell_of(F.col("user_id")).alias("cell"))
            .groupBy("r", "cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    full = sketch(ev)
    # mergeability: cell-wise sum of two partial sketches == the full
    # sketch, exactly (the property that makes CMS distributable)
    merged = (
        sketch(ev.filter(F.col("event_id") % 2 == 0))
        .unionByName(sketch(ev.filter(F.col("event_id") % 2 == 1)))
        .groupBy("r", "cell")
        .agg(F.sum("n").alias("n"))
    )
    diff = (
        merged.withColumnRenamed("n", "nm")
        .join(full.withColumnRenamed("n", "nf"), ["r", "cell"], "full")
        .filter(~F.coalesce(F.col("nm") == F.col("nf"), F.lit(False)))
        .count()
    )
    assert diff == 0, f"merged sketch diverges from full sketch in {diff} cells"

    keys = (
        ev.filter(F.col("user_id") % 97 == 0)
        .select("user_id")
        .distinct()
    )
    probe = keys.crossJoin(F.broadcast(rs)).select(
        "user_id", "r", cell_of(F.col("user_id")).alias("cell")
    )
    est = (
        probe.join(full, ["r", "cell"])
        .groupBy("user_id")
        .agg(F.min("n").cast("long").alias("cms_est"))
    )
    truth = (
        ev.filter(F.col("user_id") % 97 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(truth, "user_id")
        .select("user_id", "true_n", "cms_est")
        .orderBy("user_id")
    )


def _dhash_band_sql(j: int, elem: str) -> str:
    """SQL for dHash band ``j`` (16 gradient bits over the 8x9 block-mean
    grid), generated ONCE for both engines — ``elem`` is the element
    accessor template (Spark ``element_at({arr}, {i})`` vs DuckDB
    ``{arr}[{i}]``) so the bit layout is identical by construction.
    The gradient compare is exact integer cross-multiplication
    (sum_a * len_b > sum_b * len_a), never a float mean."""
    terms = []
    for k in range(16):
        g = 16 * j + k
        r, c = divmod(g, 8)
        a, b = r * 9 + c + 1, r * 9 + c + 2
        sa = elem.format(arr="s", i=a)
        sb = elem.format(arr="s", i=b)
        la = elem.format(arr="l", i=a)
        lb = elem.format(arr="l", i=b)
        terms.append(
            f"(CASE WHEN {sa} * {lb} > {sb} * {la} THEN {1 << k} ELSE 0 END)"
        )
    return " + ".join(terms)


def _dhash_oracle() -> str:
    bands = ",\n      ".join(
        f"CAST({_dhash_band_sql(j, '{arr}[{i}]')} AS INT) AS b{j}" for j in range(4)
    )
    return f"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, translate(text, 'aes', 'bgy') AS text
      FROM documents WHERE doc_id % 25 = 0
    ),
    rs AS (
      SELECT doc_id,
             CASE WHEN length(text) < 144 THEN rpad(text, 144, text)
                  ELSE text END AS t
      FROM base
    ),
    px AS (
      SELECT doc_id,
        list_transform(range(0, 72), i -> list_sum(list_transform(
          range(CAST(floor(length(t) * i / 72) AS BIGINT) + 1,
                CAST(floor(length(t) * (i + 1) / 72) AS BIGINT) + 1),
          p -> ord(substr(t, CAST(p AS INT), 1))))) AS s,
        list_transform(range(0, 72), i ->
          CAST(floor(length(t) * (i + 1) / 72) AS BIGINT)
          - CAST(floor(length(t) * i / 72) AS BIGINT)) AS l
      FROM rs
    ),
    bands AS (SELECT doc_id, {bands} FROM px),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.b0 AS ab0, a.b1 AS ab1, a.b2 AS ab2, a.b3 AS ab3,
             b.b0 AS bb0, b.b1 AS bb1, b.b2 AS bb2, b.b3 AS bb3
      FROM bands a JOIN bands b
        ON a.doc_id < b.doc_id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    )
    SELECT id_a, id_b, hamming FROM (
      SELECT id_a, id_b,
             CAST(bit_count(xor(ab0, bb0)) + bit_count(xor(ab1, bb1))
                  + bit_count(xor(ab2, bb2)) + bit_count(xor(ab3, bb3))
                  AS INT) AS hamming
      FROM cand
    ) WHERE hamming <= 6
    ORDER BY id_a, id_b
    """


@query(
    "q331_perceptual_hash_dedup",
    oracle=_dhash_oracle(),
    tags=("multimodal", "dedup", "lsh", "perceptual-hash"),
)
def q331_perceptual_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (dHash) near-duplicate detection over multimodal
    payloads — the canonical image-dedup recipe (resize to a tiny
    grayscale grid, hash the horizontal GRADIENT signs, compare by
    hamming distance), expressed entirely in JVM codegen over the
    engine's multimodal envelope bytes. The "decode+resize" stand-in
    is area interpolation over the payload: 72 block SUMS + lengths
    (8 rows x 9 cols), with each gradient bit an exact integer
    cross-multiplication sum_a*len_b > sum_b*len_a — no float mean, so
    both engines agree bit-for-bit. Payloads shorter than 144 bytes
    cycle-pad (rpad(text, 144, text)), the multimodal fake_resize
    convention.

    dHash's contract — and this fixture proves BOTH halves: robust to
    VALUE noise (the planted variants are re-encoding-style byte
    perturbations, translate 'aes'->'bgy': hamming 0-4, found), NOT to
    content shifts (an appended tail re-frames every block, hamming
    ~32 = random — those pairs are correctly absent; that's MinHash's
    q53 job, not dHash's).

    Scale shape: hashing is one map-only pass (64 bits per payload);
    candidates come from FOUR 16-bit banded equi-joins (never an
    all-pairs compare — same blocking discipline as q53/q65); verify
    is bit_count(xor) on the KB-sized candidate set. At 100 TB the
    shuffle carries (band_value, 4x int) per doc, not payloads."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.translate(F.col("text"), "aes", "bgy").alias("text"),
        )
    ).select(
        "doc_id",
        F.expr(
            "CASE WHEN length(text) < 144 THEN rpad(text, 144, text) "
            "ELSE text END"
        ).alias("t"),
    )
    sums = (
        "transform(sequence(0, 71), i -> aggregate("
        "  transform(sequence(cast(floor(length(t) * i / 72) as int) + 1,"
        "                     cast(floor(length(t) * (i + 1) / 72) as int)),"
        "            p -> ascii(substring(t, p, 1))),"
        "  0L, (acc, x) -> acc + x))"
    )
    lens = (
        "transform(sequence(0, 71), i -> "
        "cast(floor(length(t) * (i + 1) / 72) as long) - "
        "cast(floor(length(t) * i / 72) as long))"
    )
    # the source fixture is a single small parquet file => one input
    # split; spread the (CPU-bound) hash pass across the cluster —
    # at 100 TB the scan has thousands of splits and this is a no-op
    # cost-wise (tiny rows: id + text)
    d = base.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", F.expr(sums).alias("s"), F.expr(lens).alias("l")
    )
    for j in range(4):
        d = d.withColumn(
            f"b{j}",
            F.expr(_dhash_band_sql(j, "element_at({arr}, {i})")).cast("int"),
        )
    # the 4 band-joins each reference d twice: persist the (KB-sized)
    # band table once instead of recomputing the hash pass 8x
    d = _swap_persist("q331_bands", d.drop("s", "l"))

    # banded LSH: four 16-bit-band equi-joins (the scalable shape —
    # never an OR-join / all-pairs compare), dedup multi-band hits
    pairs = None
    for j in range(4):
        a, b = d.alias("a"), d.alias("b")
        p = a.join(
            b,
            (F.col(f"a.b{j}") == F.col(f"b.b{j}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            *[F.col(f"a.b{i}").alias(f"ab{i}") for i in range(4)],
            *[F.col(f"b.b{i}").alias(f"bb{i}") for i in range(4)],
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = sum(
        F.bit_count(F.col(f"ab{i}").bitwiseXOR(F.col(f"bb{i}"))) for i in range(4)
    )
    return (
        pairs.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


def _q373_oracle(
    k: int = 8,
    min_span: int = 14,
    max_doc_freq: float = 0.05,
    max_docs_per_gram: int = 64,
    top_n: int = 100,
) -> str:
    """DuckDB twin of operators/dedup.py::duplicated_spans — the same
    mod-2^64 per-position k-gram hash as _q65_oracle (0-based
    positions), rare-hash gate on DISTINCT doc count, diagonal-run
    collapse via ROW_NUMBER, and pair-level span accounting."""
    B, M = 1_000_003, 1 << 64
    powers = [pow(B, k - 1 - j, M) for j in range(k)]
    hash_terms = " + ".join(
        f"CAST(ascii(substring(s, i + {1 + j}, 1)) AS HUGEINT) * {p}"
        for j, p in enumerate(powers)
    )
    return f"""
    WITH norm AS MATERIALIZED (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, i AS pos,
             CASE WHEN ({hash_terms}) % {M} >= {1 << 63}
                  THEN CAST(({hash_terms}) % {M} - {M} AS BIGINT)
                  ELSE CAST(({hash_terms}) % {M} AS BIGINT) END AS h
      FROM norm, UNNEST(range(0, length(s) - {k} + 1)) AS t(i)
      WHERE length(s) >= {k}
    ),
    rare AS (
      SELECT h FROM grams GROUP BY h
      HAVING COUNT(DISTINCT doc_id) <= LEAST(GREATEST(
        CAST(FLOOR((SELECT COUNT(*) FROM documents) * {max_doc_freq}) AS BIGINT), 2),
        {max_docs_per_gram})
    ),
    g AS MATERIALIZED (SELECT doc_id, pos, h FROM grams JOIN rare USING (h)),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.pos AS pos_a, a.pos - b.pos AS diag
      FROM g a JOIN g b USING (h)
      WHERE a.doc_id < b.doc_id
    ),
    r AS (
      SELECT id_a, id_b, diag, pos_a,
             pos_a - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
      FROM m
    ),
    runs AS (
      SELECT id_a, id_b, COUNT(*) + {k - 1} AS span_len
      FROM r GROUP BY id_a, id_b, diag, grp
      HAVING COUNT(*) + {k - 1} >= {min_span}
    )
    SELECT id_a, id_b, COUNT(*) AS n_spans,
           CAST(MAX(span_len) AS BIGINT) AS max_span_len,
           CAST(SUM(span_len) AS BIGINT) AS dup_chars
    FROM runs GROUP BY id_a, id_b
    ORDER BY max_span_len DESC, id_a, id_b LIMIT {top_n}
    """


@query("q373_duplicated_spans", oracle=_q373_oracle(), tags=("llm", "dedup"))
def q373_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring extraction (the ExactSubstr result of
    Lee et al. 2021) in distributed diagonal-run form — see
    operators/dedup.py::duplicated_spans. Where q65's winnowing emits
    CANDIDATE pairs, this emits the exact shared spans themselves
    (count, longest, total duplicated chars per pair): the operator a
    training-data pipeline uses to CUT the duplicated region, not just
    flag the pair. Sub-quadratic by the same rare-gram gate as
    winnowing/LSH; one equi-join shuffle + one window pass."""
    from ent_fins_lakehouse_spark.operators.dedup import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", k=8, min_span=14, max_doc_freq=0.05)


def _q375_oracle(k: int = 100) -> str:
    """DuckDB twin of q375 — md5-uniform draw, det_ln_ratio ln, one
    correctly rounded division by the weight: bit-identical keys."""
    from ent_fins_lakehouse_spark.functions.detmath import det_ln_ratio_sql

    u = "CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1"
    key = f"({det_ln_ratio_sql(u, str(1 << 32))} / CAST(n_tokens AS DOUBLE))"
    return f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_tokens, {key} AS sample_key
    FROM w WHERE n_tokens > 0
    ORDER BY sample_key DESC, doc_id LIMIT {k}
    """


@query("q375_weighted_reservoir_sample", oracle=_q375_oracle(), tags=("llm", "sampling"))
def q375_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis A-ES key (the distributed-reservoir classic): each row
    draws u ~ U(0,1] and takes key = ln(u)/w; the global top-k by key
    IS an exact weighted sample without replacement. The draw is the
    engine's md5-uniform device (a pure function of doc_id — same
    sample on every engine and every rerun), the ln is
    detmath.det_ln_ratio over the integer pair (m+1, 2^32) so the key
    is bit-identical to the DuckDB oracle, and the weight is the
    corpus token count (sampling ∝ tokens — the mixture-building
    primitive the temp-mix/DSIR family composes with).

    Physical shape at 100 TB: one linear scan, all-codegen key
    arithmetic, TakeOrderedAndProject top-k (per-partition k-row heaps
    + a k·partitions driver merge — the distributed reservoir; no
    global sort shuffle)."""
    from ent_fins_lakehouse_spark.functions.detmath import det_ln_ratio
    from ent_fins_lakehouse_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    m1 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + F.lit(1)
    )
    key = det_ln_ratio(m1, F.lit(1 << 32)) / F.col("n_tokens").cast("double")
    return (
        docs.filter(F.col("n_tokens") > 0)
        .select("doc_id", "n_tokens", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(100)
    )


_Q385_ORACLE = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0
    ),
    a AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 40 = 0),
    scored AS (
      SELECT a.query_id, e.vec_id,
             list_dot_product(e.v, a.qv)
               / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(a.qv, a.qv)))
               AS cosine_sim
      FROM a JOIN e ON e.vec_id <> a.query_id
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
      ) AS rank FROM scored
    )
    SELECT query_id, vec_id, cosine_sim, CAST(rank AS INT) AS rank,
           TRUE AS batch_recall_ok
    FROM rk WHERE rank <= 3 ORDER BY query_id, rank
    """


@query(
    "q385_ivf_batch_mining",
    oracle=_Q385_ORACLE,
    tags=("llm", "similarity", "layout", "mining"),
)
def q385_ivf_batch_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED ANN mining over the persisted IVF layout — the
    throughput tier q207's rescore step routes through at 100 TB:
    every anchor (here vec_id % 40 — the mining 2.5%) ranks the
    centroids driver-side, ONE partition-pruned scan reads the union
    of probed cells, the (anchor, cell) pairs broadcast into the scan,
    and a JVM dot-product join + per-anchor window yields each
    anchor's top-k — cost Σ_cell |rows| × |anchors probing cell|,
    never |corpus| × |anchors| (:func:`operators.similarity.ivf_batch_topk`).

    Hard signal: the payload is the exact per-anchor top-3 (brute
    force, self excluded — hash-checked by the oracle's window), and
    the batch probe's per-anchor hits vs that exact set fold into
    ``batch_recall_ok`` (floor 50% of all exact slots — the 4/8-cell
    probe bound, same band as q60/q144)."""
    import math

    from ent_fins_lakehouse_spark.operators.similarity import (
        _dot,
        _norm,
        ivf_batch_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path, centroids = _ivf_sq8_layout(spark, sf_dir, n_clusters=8)
    anchors = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    served = ivf_batch_topk(
        spark, path, centroids, anchors, k=4, n_probe=4
    ).filter(F.col("vec_id") != F.col("query_id"))

    # exact per-anchor top-3 (the payload): broadcast anchor matrix,
    # JVM codegen dot, one window — q207's kernel
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    ).withColumn("_n", _norm(F.col("_v"))).filter(F.col("_n") > 0)
    a = e.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    from pyspark.sql import Window as W

    scored = (
        e.crossJoin(F.broadcast(a))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("_v"), F.col("_qv")) / (F.col("_n") * F.col("_qn"))).alias(
                "cosine_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    exact = _swap_persist(
        "q385_exact",
        scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 3
        ),
    )
    n_slots = exact.count()
    n_hit = (
        served.select("query_id", "vec_id")
        .join(exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "inner")
        .count()
    )
    ok = n_slots == 0 or n_hit >= math.ceil(0.5 * n_slots)
    return exact.select(
        "query_id",
        "vec_id",
        "cosine_sim",
        "rank",
        F.lit(bool(ok)).alias("batch_recall_ok"),
    ).orderBy("query_id", "rank")
