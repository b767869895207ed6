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
) -> DataFrame:
    """Exact all-pairs cosine within blocking keys — the embedding
    analogue of :func:`dedup.jaccard_pairs_blocked`. Blocking bounds
    the quadratic join (at 100 TB the block is a shard/cluster key,
    e.g. an IVF cluster id); inside a block the dot products run in
    codegen via zip_with/aggregate. Returns (id_a, id_b, cosine_sim)
    with id_a < id_b, thresholded and/or global top-N by similarity
    (TakeOrderedAndProject — no full sort)."""
    # Norms are computed ONCE per vector before the self-join (the
    # per-pair formulation would fold each array O(block) extra times);
    # same operand values either way, so the division stays bit-exact
    # vs the oracle. Persist: both join sides read it.
    t = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", _norm(F.col("_v"))).persist()
    a = t.select(
        F.col("_id").alias("id_a"),
        *[F.col(c).alias(f"a_{c}") for c in block_cols],
        F.col("_v").alias("v_a"),
        F.col("_n").alias("n_a"),
    )
    b = t.select(
        F.col("_id").alias("id_b"),
        *[F.col(c).alias(f"b_{c}") for c in block_cols],
        F.col("_v").alias("v_b"),
        F.col("_n").alias("n_b"),
    )
    cond = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols] + [
        F.col("id_a") < F.col("id_b")
    ]
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    out = a.join(b, cond).select("id_a", "id_b", cos.alias("cosine_sim"))
    if min_cosine is not None:
        out = out.filter(F.col("cosine_sim") >= min_cosine)
    if top_n is not None:
        out = out.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")).limit(top_n)
    return out


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


def cosine_pairs_blockwise_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_cols: list[str],
    top_n: int | None = None,
    min_cosine: float | None = None,
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
        norms[norms == 0.0] = 1.0
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
        if min_cosine is not None:
            res = res[res["cosine_sim"] >= min_cosine]
        if top_n is not None and len(res) > top_n:
            res = res.nlargest(top_n, "cosine_sim")
        return res

    out = (
        df.select(id_col, *block_cols, vec_col)
        .groupBy(*block_cols)
        .applyInPandas(block_pairs, schema=out_schema)
    )
    if top_n is not None:
        out = out.orderBy(F.desc("cosine_sim"), F.asc("id_a"), F.asc("id_b")).limit(top_n)
    return out
