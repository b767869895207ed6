"""Embedding similarity search over ``array<float>`` columns.

Three tiers, mirroring how a 100 TB vector corpus is actually served:

- **Brute-force cosine top-k** (baseline / ground truth): the dot
  product runs JVM-side with array higher-order functions
  (``zip_with`` + ``aggregate``) inside whole-stage codegen — no
  Python in the loop; top-k via TakeOrderedAndProject, so nothing but
  k rows ever reaches the driver.
- **LSH-bucketed** (``BucketedRandomProjectionLSH``): random-
  hyperplane buckets turn the all-pairs problem into same-bucket
  candidates — the scale path for similarity *joins*.
- **IVF** (inverted-file): KMeans coarse quantizer; queries probe the
  nearest ``n_probe`` centroids and scan only those partitions. The
  centroid assignment is a narrow map; the index is just a column —
  repartition by cluster id and you have data co-location for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Over-fetch margin for rescore_exact candidate selection: BLAS
#: scores drift 1-3 ULPs from the exact fold, so cuts made on them
#: keep this many extra rows and the strict cut binds on the exact
#: rescored values. Losing a true top-k member would need >margin
#: pairs packed within ULPs of the boundary.
RESCORE_MARGIN = 16


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_cosine(df: DataFrame, vec_col: str, query: list[float], out_col: str = "cosine_sim") -> DataFrame:
    """Cosine similarity of every row's vector to a constant query
    vector — broadcast as a literal array, evaluated in codegen."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return df.withColumn(out_col, _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)))


def cosine_topk(df: DataFrame, vec_col: str, query: list[float], k: int, id_col: str) -> DataFrame:
    """Brute-force exact top-k by cosine (the recall=1.0 baseline)."""
    return (
        with_cosine(df, vec_col, query)
        .select(id_col, "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _to_ml_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("_v", array_to_vector(F.col(vec_col).cast("array<double>")))


def ann_topk_lsh(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int,
    id_col: str,
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH: probe the query's
    buckets across ``num_tables`` tables; only same-bucket vectors are
    scored (Euclidean; for unit-normalized embeddings the Euclidean
    ranking equals the cosine ranking)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    feats = _to_ml_vectors(df, vec_col)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length, numHashTables=num_tables, seed=seed
    )
    model = lsh.fit(feats)
    res = model.approxNearestNeighbors(feats, Vectors.dense([float(x) for x in query]), k)
    return res.select(id_col, F.col("distCol").alias("euclidean_dist"))


def similarity_join_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    max_euclidean: float,
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """All-pairs similarity join under a distance threshold, LSH-
    bucketed (sub-quadratic candidate generation)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    feats = _to_ml_vectors(df, vec_col)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length, numHashTables=num_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_euclidean, distCol="euclidean_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "euclidean_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str],
    top_n: int | None = None,
    min_cosine: float | None = None,
    max_block_size: int | None = None,
    on_oversize: str = "subshard",
    max_total_pairs: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine within blocking keys — the embedding
    analogue of :func:`dedup.jaccard_pairs_blocked`. Blocking bounds
    the quadratic join (at 100 TB the block is a shard/cluster key,
    e.g. an IVF cluster id); inside a block the dot products run in
    codegen via zip_with/aggregate. Returns (id_a, id_b, cosine_sim)
    with id_a < id_b, thresholded and/or global top-N by similarity
    (TakeOrderedAndProject — no full sort).

    The bounded-block contract is enforced in code: oversized blocks
    triangle hash-sub-shard (exact, bit-identical; bounded per-task
    pair counts) or raise, and a total-pair census guard refuses
    unbounded use with a pointer to :func:`similarity_join_lsh` /
    IVF — see ``operators/blocking.py``.

    Zero-norm vectors are dropped before pairing (cosine is undefined
    for them); :func:`cosine_pairs_blockwise_numpy` applies the same
    convention so the two physical strategies stay interchangeable.
    """
    from ent_fins_lakehouse_spark.operators.blocking import (
        DEFAULT_MAX_BLOCK_SIZE,
        DEFAULT_MAX_TOTAL_PAIRS,
        bounded_pair_sides,
    )

    # Norms are computed ONCE per vector before the self-join (the
    # per-pair formulation would fold each array O(block) extra times);
    # same operand values either way, so the division stays bit-exact
    # vs the oracle. Persist: both join sides read it.
    t = (
        df.select(
            F.col(id_col).alias("_id"),
            *[F.col(c) for c in block_cols],
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_n", _norm(F.col("_v")))
        .filter(F.col("_n") > 0)
        .persist()
    )
    a, b, cond = bounded_pair_sides(
        t,
        block_cols,
        max_block_size=max_block_size or DEFAULT_MAX_BLOCK_SIZE,
        on_oversize=on_oversize,
        max_total_pairs=max_total_pairs or DEFAULT_MAX_TOTAL_PAIRS,
    )
    cos = _dot(F.col("_v_a"), F.col("_v_b")) / (F.col("_n_a") * F.col("_n_b"))
    out = a.join(b, cond).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        cos.alias("cosine_sim"),
    )
    if min_cosine is not None:
        out = out.filter(F.col("cosine_sim") >= min_cosine)
    if top_n is not None:
        out = out.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")).limit(top_n)
    return out


def quantize_int8(
    df: DataFrame, vec_col: str, qvec_col: str = "qvec", scale_col: str = "qscale"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``scale =
    max(|x|)/127``, ``q_i = floor(x_i/scale + 0.5)`` ∈ [-127, 127].

    This is the storage-side half of quantized vector search: a 64-dim
    float32 embedding (256 B) becomes 64 int8s + one double scale
    (~72 B), a 3.5× scan-size cut that matters more than compute at
    100 TB. All arithmetic is plain double ops in codegen —
    deterministic and expressible in ANSI SQL, so the whole pipeline
    stays oracle-checkable. Zero vectors (scale = 0) are the caller's
    responsibility — similarity search drops them anyway (cosine is
    undefined).

    ``floor(x + 0.5)`` rather than ``round(x)``: half-up-toward-+inf
    has identical IEEE semantics in Spark, DuckDB, and numpy, while
    ``round`` differs (HALF_UP vs banker's) across engines.
    """
    v = F.col(vec_col).cast("array<double>")
    out = df.withColumn(
        scale_col, F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    )
    return out.withColumn(
        qvec_col,
        F.transform(v, lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int")),
    )


def dequantize(qvec_col: str, scale_col: str) -> "F.Column":
    """Reconstruct the approximate double vector from (qvec, scale)."""
    return F.transform(F.col(qvec_col), lambda i: i.cast("double") * F.col(scale_col))


def quantized_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_candidates: int = 50,
) -> DataFrame:
    """Filter-then-rescore ANN over int8-quantized vectors: score every
    row against the (also-quantized) query in the cheap quantized
    domain, keep the ``n_candidates`` best, rescore those exactly on
    the full-precision vectors, return the exact top-``k``.

    The classic quantized-search shape (IVF-SQ8 without the IVF
    partitioning — compose with :func:`build_ivf_index` for both): the
    full-precision column is only touched for ``n_candidates`` rows,
    so at scale the hot scan reads the ~3.5×-smaller quantized column.
    Both phases are deterministic double arithmetic with (sim DESC, id
    ASC) tie-breaks — exact-oracle-checkable end to end.
    """
    import math

    if not query or max(abs(float(x)) for x in query) == 0.0:
        raise ValueError(
            "quantized_ann_topk: query vector is all zeros — cosine "
            "similarity (and the int8 quantization scale) is undefined "
            "for a zero vector"
        )
    qs = max(abs(float(x)) for x in query) / 127.0
    dq_query = [math.floor(float(x) / qs + 0.5) * qs for x in query]
    qlit = F.array(*[F.lit(float(x)) for x in query])
    dqlit = F.array(*[F.lit(float(x)) for x in dq_query])

    base = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_n", _norm(F.col("_v")))
        .filter(F.col("_n") > 0)
    )
    qz = quantize_int8(base, "_v")
    dv = dequantize("qvec", "qscale")
    approx = (_dot(dv, dqlit) / (_norm(dv) * _norm(dqlit))).alias("approx_sim")
    cand = (
        qz.select(id_col, "_v", approx)
        .orderBy(F.desc("approx_sim"), F.asc(id_col))
        .limit(n_candidates)
    )
    exact = (_dot(F.col("_v"), qlit) / (_norm(F.col("_v")) * _norm(qlit))).alias("cosine_sim")
    return (
        cand.select(id_col, "approx_sim", exact)
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def build_ivf_index(
    df: DataFrame, vec_col: str, n_clusters: int = 16, seed: int = 42
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans centroids + cluster assignment
    column. Returns (indexed_df, centroids). At scale, write the
    result partitioned by ``ivf_cluster`` so probes do partition-
    pruned scans."""
    from pyspark.ml.clustering import KMeans

    feats = _to_ml_vectors(df, vec_col)
    km = KMeans(k=n_clusters, seed=seed, featuresCol="_v", predictionCol="ivf_cluster")
    model = km.fit(feats)
    indexed = model.transform(feats).drop("_v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    query: list[float],
    k: int,
    id_col: str,
    n_probe: int = 4,
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query (driver-side,
    tiny), scan only the ``n_probe`` nearest clusters, exact-score the
    survivors. Recall grows with n_probe; n_probe=n_clusters is exact."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query))
    probe = ranked[:n_probe]
    return (
        with_cosine(indexed.filter(F.col("ivf_cluster").isin(probe)), vec_col, query)
        .select(id_col, "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


#: ivf_batch_topk ships the query set through the driver (centroid
#: ranking) and broadcasts it into the probe join — a MINING anchor
#: set, not a table. The cap makes an accidental table-sized query
#: side fail loudly instead of OOM-ing the driver.
BATCH_PROBE_MAX_QUERIES = 100_000


def ivf_batch_topk(
    spark,
    layout_path: str,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """BATCHED IVF probe over a persisted serving layout — the
    throughput shape q207's docstring points at: hard-negative mining,
    retrieval-index refresh, and eval sweeps probe with THOUSANDS of
    query vectors at once, where per-query serving (q144/q148) would
    pay a scan each. One plan serves the whole batch:

    1. every query ranks the centroid list driver-side (the probe set
       is bounded — ``BATCH_PROBE_MAX_QUERIES`` — and the centroid
       matrix is tiny) and emits ``n_probe`` (query, cell) rows;
    2. ONE partition-pruned scan reads the UNION of probed cells —
       zero bytes from cells no query probes;
    3. the (query, cell) rows BROADCAST into the scan, so scoring is
       a JVM-codegen dot-product join whose cost is
       Σ_cell |rows(cell)| × |queries probing cell| — the IVF-bounded
       mining cost, never |corpus| × |queries|;
    4. a per-query window keeps the exact top-k among scored rows
       (deterministic ties by id).

    Returns (query_id, id_col, cosine_sim, rank). Recall per query
    matches the single-probe operator (same cells, same scoring)."""
    import numpy as np

    # Arrow-batched collection: on an array<float> column toPandas with
    # Arrow enabled lands each cell as a numpy array, so the matrix
    # assembly below never runs an interpreted per-element float() loop
    # (the r13 prologue's one remaining Python-per-element pass —
    # ~7.7e7 conversions at the 100k × 768 cap).
    sel = queries.select(query_id_col, vec_col).limit(
        BATCH_PROBE_MAX_QUERIES + 1
    )
    _arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
    _arrow_was = spark.conf.get(_arrow_key, "false")
    spark.conf.set(_arrow_key, "true")
    try:
        pdf = sel.toPandas()
    finally:
        spark.conf.set(_arrow_key, _arrow_was)
    if len(pdf) > BATCH_PROBE_MAX_QUERIES:
        raise ValueError(
            f"batch probe query set exceeds {BATCH_PROBE_MAX_QUERIES:,} "
            "rows — a query side this large is a table, not a mining "
            "anchor set; join against the layout directly instead"
        )

    # Centroid ranking is ONE matmul over the whole anchor batch, not a
    # per-anchor Python loop: at the operator's envelope (100k anchors ×
    # thousands of centroids × 768 dims) interpreted float loops are a
    # driver-hours prologue; Q·Cᵀ + one stable lexsort is seconds.
    probe_rows = []
    if len(pdf):
        qmat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        cmat = np.asarray(centroids, dtype=np.float64)
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        cn = np.linalg.norm(cmat, axis=1, keepdims=True)
        qn[qn == 0.0] = 1.0
        cn[cn == 0.0] = 1.0
        sims = (qmat / qn) @ (cmat / cn).T  # (n_queries, n_centroids)
        take = min(n_probe, len(centroids))
        # full per-row stable ranking by (-sim, cell index): equal sims
        # straddling the n_probe boundary resolve to the LOWEST cell
        # index — the selection the stable per-query sorted() made.
        # argpartition alone picks arbitrarily among boundary ties, so
        # the probed cell SET could differ run-to-run; a full lexsort
        # over the (bounded, thousands-wide) centroid axis is cheap and
        # deterministic.
        idx = np.broadcast_to(np.arange(len(centroids)), sims.shape)
        part = np.lexsort((idx, -sims), axis=1)[:, :take]
        qids = pdf[query_id_col].tolist()
        for ri, qid in enumerate(qids):
            qv = qmat[ri].tolist()
            for cell in part[ri]:
                probe_rows.append((qid, int(cell), qv))
    qdt = dict(queries.dtypes)[query_id_col]
    if not probe_rows:
        return spark.createDataFrame(
            [],
            f"{query_id_col} {qdt}, {id_col} long, cosine_sim double, rank int",
        )
    qdf = spark.createDataFrame(
        probe_rows, f"{query_id_col} {qdt}, ivf_cluster int, _qv array<double>"
    )
    cells = sorted({c for _q, c, _v in probe_rows})
    scan = spark.read.parquet(layout_path).filter(
        F.col("ivf_cluster").isin(cells)
    )
    from pyspark.sql import Window as W

    cand = scan.join(F.broadcast(qdf), "ivf_cluster")
    score = (
        _dot(F.col(vec_col).cast("array<double>"), F.col("_qv"))
        / (_norm(F.col(vec_col).cast("array<double>")) * _norm(F.col("_qv")))
    ).alias("cosine_sim")
    w = W.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        cand.select(query_id_col, id_col, score)
        # a query probing n_probe cells never sees a row twice (cells
        # partition the corpus), so no dedup is needed before ranking
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def cosine_pairs_blockwise_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str],
    top_n: int | None = None,
    min_cosine: float | None = None,
    rescore_exact: bool = False,
) -> DataFrame:
    """All-pairs cosine within blocks as one BLAS matrix product per
    block (``applyInPandas``) — the dense-block scale path beside
    :func:`cosine_pairs_blocked`'s codegen'd per-pair fold.

    Why both exist: per-pair ``zip_with``/``aggregate`` evaluates an
    interpreted expression per (pair × dimension); a block of n
    d-dim vectors is better served by a single n×d @ d×n dgemm. The
    crossover favors numpy once blocks hold more than a few dozen
    vectors. Blocks must be driver-bounded in memory — the intended
    block key at scale is an IVF cell / LSH bucket (thousands of
    vectors, n² pair matrix in MBs), never an unbounded corpus.

    Per-block top-``top_n`` is taken inside the UDF (global top-N ⊆
    union of per-block top-Ns, since pairs never span blocks), so at
    most ``top_n × n_blocks`` rows leave the executors before the
    final TakeOrderedAndProject.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    # selection margins under rescore_exact: per-block and global cuts
    # run on the (ULP-drifted) BLAS scores, so they over-fetch and the
    # strict top_n / min_cosine bind on the exact rescored values
    _sel_top = (top_n + RESCORE_MARGIN) if (rescore_exact and top_n is not None) else top_n
    _sel_min = (min_cosine - 1e-9) if (rescore_exact and min_cosine is not None) else min_cosine

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        ids = pdf[id_col].to_numpy()
        U = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.sqrt((U * U).sum(axis=1))
        # same convention as cosine_pairs_blocked: zero-norm vectors
        # have no defined cosine — drop them so the two strategies
        # stay interchangeable
        keep = norms > 0.0
        if not keep.all():
            ids, U, norms = ids[keep], U[keep], norms[keep]
            n = len(ids)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        G = (U @ U.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(n, k=1)
        a, b = ids[iu], ids[ju]
        res = pd.DataFrame(
            {
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine_sim": G[iu, ju],
            }
        )
        if _sel_min is not None:
            res = res[res["cosine_sim"] >= _sel_min]
        if _sel_top is not None and len(res) > _sel_top:
            # deterministic tie-break matching cosine_pairs_blocked's
            # orderBy(desc(sim), id_a, id_b) — nlargest alone keeps
            # input order among ties, which can differ between the
            # two strategies on tie-heavy data
            res = res.sort_values(
                ["cosine_sim", "id_a", "id_b"], ascending=[False, True, True]
            ).head(_sel_top)
        return res

    out = (
        df.select(id_col, *block_cols, vec_col)
        .groupBy(*block_cols)
        .applyInPandas(block_pairs, schema=out_schema)
    )
    if top_n is not None and not rescore_exact:
        out = out.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")).limit(top_n)
    if rescore_exact:
        # Filter-then-rescore (the q138 pattern): BLAS picks the pairs,
        # but dgemm's blocked summation drifts 1-3 ULPs from the
        # sequential fold, so the EMITTED cosine is recomputed with the
        # same codegen'd _dot/_norm shape as cosine_pairs_blocked —
        # bit-identical to the exact path / SQL oracle. The SELECTION
        # must not inherit the drift either: candidates are cut with a
        # margin (top_n + RESCORE_MARGIN pre-rescore) and the FINAL
        # top_n / min_cosine are applied on the exact values — a
        # knife-edge pair at the boundary would need > margin drifted
        # scores between it and the cut to be lost. The candidate set
        # is tiny, so it broadcasts into two joins against the vectors.
        pairs = out
        if top_n is not None:
            pairs = pairs.orderBy(
                F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")
            ).limit(top_n + RESCORE_MARGIN)
            # top_n bounds the candidate set, so it broadcasts safely;
            # without it the per-block pair set is only min_cosine-
            # filtered (or unfiltered) and can exceed driver memory —
            # let AQE pick the join strategy from real sizes instead
            pairs = F.broadcast(pairs.select("id_a", "id_b"))
        else:
            pairs = pairs.select("id_a", "id_b")
        t = (
            df.select(
                F.col(id_col).alias("_rid"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            .withColumn("_n", _norm(F.col("_v")))
            .filter(F.col("_n") > 0)
        )
        a = t.select(
            F.col("_rid").alias("id_a"), F.col("_v").alias("_v_a"), F.col("_n").alias("_n_a")
        )
        b = t.select(
            F.col("_rid").alias("id_b"), F.col("_v").alias("_v_b"), F.col("_n").alias("_n_b")
        )
        cos = _dot(F.col("_v_a"), F.col("_v_b")) / (F.col("_n_a") * F.col("_n_b"))
        out = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .select("id_a", "id_b", cos.alias("cosine_sim"))
        )
        if min_cosine is not None:
            # exact threshold on the exact value (candidates were
            # admitted with the drift-tolerant one)
            out = out.filter(F.col("cosine_sim") >= min_cosine)
        out = out.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b"))
        if top_n is not None:
            out = out.limit(top_n)
    return out


def _lloyd_kmeans(X, k: int, seed: int, iters: int = 25) -> list[list[float]]:
    """Deterministic k-means++ / Lloyd's over a numpy sample — the
    codebook trainer. Vectorized distance expansion (‖x‖²−2x·c+‖c‖²);
    empty clusters reseed from the data, same seed → same centroids."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    if n == 0:
        return [[0.0] * X.shape[1] for _ in range(k)]
    centers = np.empty((min(k, n), X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.randint(n)]
    d2 = ((X - centers[0]) ** 2).sum(1)
    for j in range(1, len(centers)):
        s = d2.sum()
        probs = d2 / s if s > 0 else np.full(n, 1.0 / n)
        centers[j] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(1))
    if len(centers) < k:  # fewer points than centroids: pad by repeat
        centers = np.vstack([centers] * ((k // len(centers)) + 1))[:k]
    xx = (X**2).sum(1)[:, None]
    for _ in range(iters):
        d = xx - 2.0 * (X @ centers.T) + (centers**2).sum(1)[None, :]
        a = d.argmin(1)
        newc = centers.copy()
        for j in range(k):
            mask = a == j
            if mask.any():
                newc[j] = X[mask].mean(0)
            else:
                newc[j] = X[rng.randint(n)]
        if np.allclose(newc, centers, atol=1e-12):
            centers = newc
            break
        centers = newc
    return [[float(v) for v in c] for c in centers]


def build_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    train_fraction: float = 1.0,
    sample_cap: int = 100_000,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space splits into
    ``m`` contiguous subspaces and each learns ``k`` KMeans centroids.
    A vector then compresses to ``m`` small codes (m=8, k=16 → 8×4
    bits = 4 bytes for a 64-dim float vector, 64×) — the compression
    tier beyond scalar int8 (8×, ``quantize_int8``), at the cost of a
    rerank pass for exactness.

    Scale design: codebooks are KB-sized index METADATA learned ONCE
    from a bounded sample (``sample_cap`` rows collected to the
    driver, the standard PQ training recipe — FAISS trains on ~10⁵-10⁶
    sampled vectors regardless of corpus size), then the CORPUS
    encodes in one distributed pass (:func:`pq_encode`). All m
    subspace fits run as vectorized numpy Lloyd's on that one sample —
    no per-fit Spark job fan-out; deterministic under ``seed``."""
    import numpy as np

    dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"vector dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    train = df.select(F.col(vec_col).alias("_vec"))
    if train_fraction < 1.0:
        train = train.sample(train_fraction, seed=seed)
    n = train.count()
    if n > sample_cap:
        # bounded, seed-deterministic sample — never collect the corpus
        train = train.sample(min(1.0, 1.05 * sample_cap / n), seed=seed).limit(
            sample_cap
        )
    X = np.asarray([r["_vec"] for r in train.collect()], dtype=np.float64)
    return [
        _lloyd_kmeans(X[:, i * sub : (i + 1) * sub], k, seed + i) for i in range(m)
    ]


def pq_encode(df: DataFrame, vec_col: str, books: list[list[list[float]]]) -> DataFrame:
    """Encode vectors to PQ codes + reconstruction norm — ONE
    distributed ``mapInPandas`` pass, numpy-vectorized per Arrow batch
    (each row: m argmin-distance lookups against the m×k codebook).
    Adds ``pq_codes array<int>`` and ``pq_norm double`` (the norm of
    the RECONSTRUCTED vector, needed for cosine under ADC)."""
    import numpy as np

    m = len(books)
    sub = len(books[0][0])
    cb = np.asarray(books, dtype=np.float64)  # (m, k, sub)
    cols = df.columns

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(pdf)
            codes = np.empty((n, m), dtype=np.int32)
            recon_sq = np.zeros(n, dtype=np.float64)
            for i in range(m):
                Xi = X[:, i * sub : (i + 1) * sub]  # (n, sub)
                # (n, k) squared distances via the expansion trick
                d2 = (
                    (Xi * Xi).sum(axis=1, keepdims=True)
                    - 2.0 * Xi @ cb[i].T
                    + (cb[i] * cb[i]).sum(axis=1)[None, :]
                )
                codes[:, i] = d2.argmin(axis=1)
                recon_sq += (cb[i][codes[:, i]] ** 2).sum(axis=1)
            out = pdf.copy()
            out["pq_codes"] = [c.tolist() for c in codes]
            out["pq_norm"] = np.sqrt(recon_sq)
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(encode, f"{schema}, pq_codes array<int>, pq_norm double")


def pq_topk(
    encoded: DataFrame,
    vectors: DataFrame,
    books: list[list[list[float]]],
    vec_col: str,
    query: list[float],
    k: int,
    id_col: str,
    rerank: int = 50,
) -> DataFrame:
    """PQ serving via Asymmetric Distance Computation: the query builds
    an m×k dot-product table against the codebooks (driver-side, tiny),
    the table embeds as ARRAY LITERALS and each row's approximate dot
    is Σ element_at(table_m, code_m + 1) — pure JVM whole-stage-codegen
    scoring, NO Python in the scan path. The approximate-cosine top
    ``rerank`` candidates then exact-rescore against the full-precision
    vectors (one semi-join), so the final top-k carries TRUE cosines;
    PQ only decides who gets rescored."""
    import math

    m = len(books)
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    sub = len(books[0][0])
    tabs = []
    for i in range(m):
        qi = query[i * sub : (i + 1) * sub]
        tabs.append([sum(a * b for a, b in zip(qi, c)) for c in books[i]])
    approx_dot = None
    for i in range(m):
        t = F.array(*[F.lit(float(v)) for v in tabs[i]])
        term = F.element_at(t, F.col("pq_codes")[i] + 1)
        approx_dot = term if approx_dot is None else (approx_dot + term)
    cand = (
        encoded.withColumn(
            "pq_score",
            F.when(F.col("pq_norm") > 0, approx_dot / (F.lit(qn) * F.col("pq_norm"))),
        )
        .orderBy(F.desc_nulls_last("pq_score"), F.asc(id_col))
        .limit(rerank)
        .select(id_col)
    )
    return (
        with_cosine(vectors.join(cand, id_col, "left_semi"), vec_col, query)
        .select(id_col, "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def assign_ivf_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """INCREMENTAL IVF assignment: tag rows with the nearest EXISTING
    centroid (squared Euclidean, KMeans' metric) so new batches append
    into a partitioned serving layout WITHOUT retraining the coarse
    quantizer — the index-maintenance half of build-once/probe-many.
    Pure JVM codegen: the centroid matrix embeds as array literals and
    each distance is one ``zip_with``+``aggregate`` fold; no Python in
    the scan. Centroid drift from accumulated appends is repaired by a
    periodic rebuild (``build_ivf_index``), as in any IVF system."""
    v = F.col(vec_col).cast("array<double>")
    dists = []
    for c in centroids:
        clit = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(v, clit, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    darr = F.array(*dists)
    best = F.array_position(darr, F.array_min(darr)) - 1
    return df.withColumn("ivf_cluster", best.cast("int"))
