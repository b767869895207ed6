"""Document deduplication operators.

All operators are DataFrame→DataFrame and shuffle-conscious:

- exact/canonical dedup: one hash-aggregate on the dedup key (the key
  is hashed, never the full row set collected).
- fingerprint dedup: md5 of normalized text → same agg, but the key is
  a fixed 32-byte column — at 100 TB you group on the digest, not the
  document body.
- MinHash LSH: per-doc signature (narrow map) → band buckets →
  shuffle on (band, bucket) — candidate pairs only within buckets, the
  classic sub-quadratic near-dup join (Broder; see PAPERS.md ICDE 2022
  string-similarity survey). Spark-native via ``pyspark.ml.feature``.
- SimHash: 64-bit signature via a vectorized Pandas UDF, candidates
  bucketed by 16-bit bands, verified by popcount Hamming distance —
  all JVM/Arrow, no row-at-a-time Python.
- blocked n-gram Jaccard: exact set similarity inside cheap blocks;
  the fully-SQL-expressible ground truth the probabilistic methods are
  tested against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_text(col) -> "F.Column":
    """Whitespace-collapsed, lowercased canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def _at_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the source arrives in
    fewer partitions (a couple of small parquet files would otherwise
    pin CPU-bound narrow work — shingling, hashing, signature UDFs —
    to a couple of cores). No-op when the scan is already wide."""
    want = df.sparkSession.sparkContext.defaultParallelism
    # partition count via the plan's input files (metadata), not
    # df.rdd — materializing the RDD lineage object per call costs a
    # py4j round-trip and analysis work (r4 ADVICE hygiene note)
    n_in = len(df.inputFiles()) or 1
    if n_in < want:
        return df.repartition(want)
    return df


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact duplicate removal on a column subset (hash aggregate)."""
    return df.dropDuplicates(cols)


def canonical_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the minimum-id representative per duplicate group, with the
    group size — deterministic (unlike dropDuplicates' arbitrary
    survivor), at the cost of carrying min(id)+count through the agg."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of the normalized text."""
    return df.withColumn(out_col, F.md5(normalize_text(text_col)))


def shingle_ngrams(df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document, computed JVM-side
    with array higher-order functions (no UDF)."""
    toks = F.split(normalize_text(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return df.withColumn(out_col, F.array_distinct(grams))


def jaccard_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.9,
    max_block_size: int | None = None,
    on_oversize: str = "subshard",
    max_total_pairs: int | None = None,
    shingle_n: int = 1,
) -> DataFrame:
    """Exact Jaccard near-dup pairs within blocking keys, over word
    unigrams (default) or word n-gram shingles (``shingle_n > 1`` —
    the same :func:`shingle_ngrams` convention the MinHash path
    hashes, so this is its exact ground truth at any n).

    Blocking bounds the quadratic comparison to each block (the same
    role LSH bands play probabilistically); inside a block the set
    intersection/union run on JVM array functions. Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    The bounded-block contract is enforced, not documented: blocks
    larger than ``max_block_size`` are triangle hash-sub-sharded
    (exact, bit-identical result; bounded per-task pair counts) or
    rejected under ``on_oversize="raise"``, and a total-pair census
    guard refuses workloads past ``max_total_pairs`` with a pointer to
    :func:`minhash_lsh_pairs` — the sub-quadratic path this ground
    truth exists to validate. See ``operators/blocking.py``.

    Matched pairs are pruned by the exact size bound before any array
    work: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so J ≥ t requires
    min ≥ t·max — an integer comparison that kills most candidates
    without evaluating array_intersect/array_union.
    """
    from ent_fins_lakehouse_spark.operators.blocking import (
        DEFAULT_MAX_BLOCK_SIZE,
        DEFAULT_MAX_TOTAL_PAIRS,
        bounded_pair_sides,
    )

    if shingle_n > 1:
        toks = F.split(normalize_text(text_col), " ")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0)))
        wexpr = F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, shingle_n), " "))
        )
    else:
        wexpr = F.array_distinct(F.split(normalize_text(text_col), " "))
    t = _at_parallelism(df.select(id_col, text_col, *block_cols)).select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        wexpr.alias("_w"),
    ).withColumn("_sz", F.size("_w")).persist()  # word sets feed both sides of the block join
    a, b, cond = bounded_pair_sides(
        t,
        block_cols,
        max_block_size=max_block_size or DEFAULT_MAX_BLOCK_SIZE,
        on_oversize=on_oversize,
        max_total_pairs=max_total_pairs or DEFAULT_MAX_TOTAL_PAIRS,
    )
    # exact length prune (1e-9 slack guards float rounding; only
    # provably-impossible pairs are dropped, so results are unchanged)
    cond = cond + [
        F.least("_sz_a", "_sz_b").cast("double")
        >= F.lit(float(threshold)) * F.greatest("_sz_a", "_sz_b") - F.lit(1e-9)
    ]
    inter = F.size(F.array_intersect("_w_a", "_w_b"))
    union = F.size(F.array_union("_w_a", "_w_b"))
    jac = inter.cast("double") / union
    return (
        a.join(b, cond)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT all-pairs Jaccard similarity join WITHOUT blocking keys —
    prefix filtering (Bayardo/Ma/Srikant, WWW'07 "Scaling Up All
    Pairs"; the PPJoin family): order each doc's shingle set by ONE
    global total order; if J(A,B) ≥ t then the smallest SHARED shingle
    has rank ≤ floor((1-t)·|x|)+1 in BOTH sets (everything before it
    is exclusive, and |x∖other| ≤ (1-t)·|x| when J ≥ t), so the pair
    collides on at least one PREFIX token. Candidates are therefore
    one equi-join on the prefix token — never a cross join — with the
    size-ratio prune (min ≥ t·max) riding the join condition, and
    survivors verify exact Jaccard.

    The global order is INCREASING DOCUMENT FREQUENCY (ties by token)
    — the paper's prescription, and the difference between a toy and
    a scalable operator: prefix tokens are then each doc's RAREST
    shingles, so the candidate join's fan-out tracks rare-token
    collisions (≈ the near-duplicate density) instead of the corpus's
    Zipf head. The r12b octave measured lexicographic ordering
    OOM-ing at 8×·sf0.1 on unigrams (~30M candidates) where df-order
    stays flat. Correctness does not depend on WHICH total order is
    used — any fixed order satisfies the rank argument — so the exact
    pair set is order-invariant (the DuckDB oracle twin uses plain
    lexicographic order).

    100 TB shape: narrow shingle map → token-df groupBy (one pass) →
    per-doc rank window → prefix rows (≈(1-t)·|s|+1 per doc) → token
    equi-join (the only shuffle that matters) → distinct pairs →
    verify join-back. Recall 1.0 by construction — the exact
    counterpart to MinHash-LSH banding. Returns (id_a, id_b, jaccard)
    with id_a < id_b."""
    from pyspark.sql import Window as W

    if shingle_n > 1:
        toks = F.split(normalize_text(text_col), " ")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0)))
        wexpr = F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, shingle_n), " "))
        )
    else:
        wexpr = F.array_distinct(F.split(normalize_text(text_col), " "))
    t = (
        _at_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col).alias("_id"), wexpr.alias("_s"))
        .withColumn("_ln", F.size("_s"))
        .persist()  # shingle sets feed the prefix pass AND the verify
    )
    ex = t.select("_id", "_ln", F.explode("_s").alias("_tok"))
    tok_df = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # +1e-9 slack: IEEE (1.0 - 0.9)*|s| lands just UNDER 0.1*|s|, so a
    # bare floor clips the prefix one short exactly when (1-t)*|s| is
    # an integer — the boundary where the guarantee needs that element
    p = (
        F.floor(F.lit(1.0 - threshold) * F.col("_ln") + F.lit(1e-9)) + 1
    ).cast("int")
    pref = (
        ex.join(tok_df, "_tok")
        .withColumn(
            "_rn",
            F.row_number().over(W.partitionBy("_id").orderBy("_df", "_tok")),
        )
        .filter(F.col("_rn") <= p)
        .select("_id", "_ln", "_tok")
        .persist()  # both sides of the prefix-token self-join read
        # this — unpersisted, the token-df groupBy + join + rank window
        # subtree executes once per side (r14 plan audit)
    )
    a = pref.select(
        F.col("_id").alias("id_a"), F.col("_ln").alias("_ln_a"), "_tok"
    )
    b = pref.select(
        F.col("_id").alias("id_b"), F.col("_ln").alias("_ln_b"), "_tok"
    )
    cand = (
        a.join(
            b,
            [
                a["_tok"] == b["_tok"],
                F.col("id_a") < F.col("id_b"),
                F.least("_ln_a", "_ln_b").cast("double")
                >= F.lit(float(threshold)) * F.greatest("_ln_a", "_ln_b") - F.lit(1e-9),
            ],
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = t.select(F.col("_id").alias("id_a"), F.col("_s").alias("_s_a"))
    sb = t.select(F.col("_id").alias("id_b"), F.col("_s").alias("_s_b"))
    inter = F.size(F.array_intersect("_s_a", "_s_b"))
    union = F.size(F.array_union("_s_a", "_s_b"))
    jac = inter.cast("double") / union
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _band_keys_udf(b: int, r: int, seed: int):
    """Pandas UDF factory: array<shingle xxhash64> → array of b band
    keys. Per Arrow batch, numpy computes k=b·r seeded minhashes
    (splitmix64 finalizer over hash XOR seed — a k×m broadcast) and
    folds each r-row band into one 64-bit key. Pure modular uint64
    arithmetic → deterministic across partitions, runs, and cluster
    sizes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    k = b * r

    @F.pandas_udf(ArrayType(LongType()))
    def _band_keys(hashes):  # pd.Series[list[int64]] -> same shape
        # splitmix64 finalizer (public-domain mixing constants)
        C1 = np.uint64(0xBF58476D1CE4E5B9)
        C2 = np.uint64(0x94D049BB133111EB)
        P = np.uint64(0x100000001B3)

        def mix(x):
            x = (x ^ (x >> np.uint64(30))) * C1
            x = (x ^ (x >> np.uint64(27))) * C2
            return x ^ (x >> np.uint64(31))

        rng = np.random.default_rng(seed)
        seeds = rng.integers(0, 2**63, size=k, dtype=np.uint64)[:, None]
        out = []
        with np.errstate(over="ignore"):
            for h in hashes:
                H = np.asarray(h, dtype=np.int64).view(np.uint64)[None, :]
                sig = mix(H ^ seeds).min(axis=1)  # (k,)
                bands = sig.reshape(b, r)
                key = np.zeros(b, dtype=np.uint64)
                for j in range(r):  # polynomial fold of the r rows
                    key = key * P + bands[:, j]
                out.append(mix(key).view(np.int64))
        return pd.Series(out)

    return _band_keys


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hash_tables: int = 8,
    rows_per_band: int = 8,
    jaccard_threshold: float = 0.9,
    shingle_n: int = 1,
    seed: int = 42,
    verify_exact: bool = True,
) -> DataFrame:
    """Approximate near-dup pairs via banded MinHash LSH: shingle
    hashing JVM-side, signatures/band keys in one vectorized numpy
    Pandas UDF, candidate join JVM-side. No driver collect.

    Classic b×r banding (Broder / Leskovec MMDS ch.3): k = b·r seeded
    minhashes per doc, hashed into b band keys of r rows each; a pair
    becomes a candidate iff it agrees on ALL r rows of some band, so
    P(candidate) = 1-(1-J^r)^b — steeply sigmoidal around the
    threshold. With the defaults (b=8, r=8): J=0.9 → 0.99 recall,
    J=0.3 → 1e-4 false-candidate rate. Deliberately NOT Spark ML's
    ``MinHashLSH.approxSimilarityJoin``: that implementation fixes
    r=1, so at J=0.3 a pair collides with 1-(1-0.3)^8 ≈ 94% — a
    near-quadratic candidate explosion on any corpus with shared
    vocabulary. Banding keeps the bucket join sub-quadratic at 100 TB.

    Physical plan: narrow map (shingles → base hashes → band keys) →
    posexplode to b rows/doc → self equi-join on (band_idx, band_val)
    — the only shuffle is on the 64-bit band key — → candidate-pair
    dedup → join back to fetch shingle sets → exact-Jaccard verify
    (``verify_exact``: the standard filter-verify pattern; precision
    1.0, recall decided by banding). Seeded → deterministic.
    """
    b, r = num_hash_tables, rows_per_band
    src = _at_parallelism(df.select(id_col, text_col))
    sh = shingle_ngrams(src, text_col, n=shingle_n)
    # Persist BEFORE the size()>0 filter: persistence is an optimizer
    # barrier, so the shingle-array expression is evaluated exactly
    # once — filtering first lets Catalyst substitute the whole array
    # chain into the predicate and re-evaluate it per consumer (the
    # banding pass plus both sides of the verify join-back).
    shingled = sh.select(id_col, "shingles").persist()
    feats = shingled.filter(F.size("shingles") > 0)
    # Hash every shingle string ONCE on the JVM (single cheap HOF
    # pass); the k permutations are derived from the 64-bit base hash
    # in a vectorized numpy kernel. (A pure-expression formulation —
    # nested transform() with an outer lambda reference — is evaluated
    # interpretively per element and measured ~30x slower.)
    hashed = feats.select(
        F.col(id_col).alias("_id"),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("_h"),
    )
    banded = hashed.select(
        "_id",
        F.posexplode(_band_keys_udf(b, r, seed)(F.col("_h"))).alias("band_idx", "band_val"),
    ).persist()  # both sides of the candidate self-join read this —
    # without it the numpy minhash/banding kernel (the expensive pass)
    # executes once PER SIDE (r14 plan audit: two ArrowEvalPython
    # subtrees for one UDF); persisted, it runs exactly once
    cand = (
        banded.select(F.col("_id").alias("id_a"), "band_idx", "band_val")
        .join(
            banded.select(F.col("_id").alias("id_b"), "band_idx", "band_val"),
            ["band_idx", "band_val"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = feats.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = feats.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    scored = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter.cast("double") / union).alias("jaccard")
    out = scored.select("id_a", "id_b", jac)
    if not verify_exact:
        return out  # unthresholded candidates, scored
    return out.filter(F.col("jaccard") >= jaccard_threshold)


def simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over word unigrams (Charikar): per-token 64-bit
    hash, signed bit-vote, sign → signature bit. Vectorized Pandas UDF
    (Arrow batches; numpy bit ops) — the per-row work is trivial but
    Python, so it runs in the Arrow fast path, not row-at-a-time."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _simhash(texts):  # pd.Series -> pd.Series (no annotations:
        # `from __future__ import annotations` breaks pyspark's
        # signature-based type inference)
        def fnv1a64(s: str) -> int:
            # inlined so the closure pickles by value — the Python
            # worker has no repo on its sys.path
            h = 0xCBF29CE484222325
            for byte in s.encode("utf-8"):
                h ^= byte
                h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = t.lower().split()
            if not toks:
                continue
            # stable 64-bit token hashes (FNV-1a), vectorized over tokens
            hs = np.array([fnv1a64(tok) for tok in set(toks)], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs by SimHash banding: split the 64-bit
    signature into 4 bands of 16 bits; by pigeonhole any pair within
    Hamming distance 3 shares at least one identical band → equi-join
    per band (shuffle on the 16-bit band value, never a cross join),
    then verify exact Hamming distance with JVM bit_count."""
    src = _at_parallelism(df.select(id_col, text_col))
    # signatures feed both sides of the band join — persist the narrow
    # (id, simhash) projection, not the text
    sh = simhash(src, text_col).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    ).persist()
    bands = (
        sh.select("_id", "simhash", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band_idx"))
        .withColumn(
            "band_val",
            # expr form: the python helper only takes a literal shift amount
            F.expr("shiftrightunsigned(simhash, band_idx * 16)").bitwiseAND(F.lit(0xFFFF)),
        )
    )
    a = bands.select(F.col("_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band_idx", "band_val")
    b = bands.select(F.col("_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band_idx", "band_val")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    out_col: str = "fingerprints",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): Rabin-Karp rolling hash over
    char k-grams of the normalized text, then the minimum hash of
    every ``window`` consecutive k-grams (rightmost-min tie rule),
    deduplicated. Guarantees any shared substring of length
    ≥ k + window - 1 contributes at least one common fingerprint —
    position-independent, so it detects partial overlap/containment
    that whole-document hashing misses.

    Vectorized numpy kernel (sliding_window_view; no per-char Python
    loop) behind an Arrow-batched Pandas UDF. Output: array<long>
    fingerprint set per document — group/join on the exploded
    fingerprint for overlap detection."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    B = np.uint64(1_000_003)  # polynomial base

    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(texts):  # pd.Series[str] -> pd.Series[list[int]]
        from numpy.lib.stride_tricks import sliding_window_view

        powers = (B ** np.arange(k - 1, -1, -1, dtype=np.uint64))[None, :]
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                s = " ".join(str(t or "").lower().split())
                data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                if len(data) < k:
                    out.append([])
                    continue
                grams = sliding_window_view(data, k).astype(np.uint64)
                hashes = (grams * powers).sum(axis=1)  # wraps mod 2^64
                if len(hashes) < window:
                    mins = np.array([hashes.min()], dtype=np.uint64)
                else:
                    wins = sliding_window_view(hashes, window)
                    mins = wins.min(axis=1)
                out.append(np.unique(mins.view(np.int64)).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, _winnow(F.col(text_col)))


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
    max_doc_freq: float = 0.05,
    max_docs_per_fp: int = 256,
) -> DataFrame:
    """Document-overlap candidates by shared winnowing fingerprints:
    explode the fingerprint sets, self-join on the 64-bit fingerprint
    value (the only shuffle), count shared prints per pair. The same
    banding-style sub-quadratic shape as MinHash LSH, but sensitive to
    partial overlap rather than whole-document similarity.

    ``max_doc_freq`` drops fingerprints present in more than that
    fraction of documents before the join — boilerplate/stop-phrase
    prints carry no overlap signal and their buckets are exactly the
    quadratic hot spots that would dominate the shuffle at 100 TB
    (the IDF analogue of winnowing practice). ``max_docs_per_fp``
    bounds the bucket ABSOLUTELY: a fraction-only gate grows with the
    corpus, so per-bucket pair fan-out (O(bucket²)) silently goes
    quadratic at scale — the r11 octave caught exactly this class in
    the sibling span operator; capped, fan-out is bounded forever."""
    fp = winnow_fingerprints(
        _at_parallelism(df.select(id_col, text_col)), text_col, k=k, window=window
    ).select(id_col, "fingerprints")
    # persist the EXPLODED relation (not the array form): it feeds the
    # frequency gate and both self-join sides
    ex = fp.select(
        F.col(id_col).alias("_id"), F.explode("fingerprints").alias("fp")
    ).persist()
    # winnow_fingerprints is row-preserving, so the doc count comes
    # from the narrow source scan (no recompute of the kernel)
    n_docs = df.select(id_col).count()
    cap = min(max(int(n_docs * max_doc_freq), 2), max_docs_per_fp)
    # gate inverted (r14, guide §3.1): anti-join the TINY persisted
    # hot set (prints in > cap docs — bounded boilerplate) instead of
    # inner-joining the huge rare set. Identical surviving rows, but
    # the broadcast side shrinks from ~every distinct print to the
    # capped hot list, and the persist keeps the gate's full-relation
    # aggregation from running once per self-join side.
    hot = (
        ex.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > cap)
        .select("fp")
        .persist()
    )
    ex = ex.join(hot, "fp", "left_anti")
    a = ex.select(F.col("_id").alias("id_a"), "fp")
    b = ex.select(F.col("_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_connected_components(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str,
    max_iter: int = 20,
    driver_union_find_limit: int = 2_000_000,
) -> DataFrame:
    """Resolve near-dup pairs into groups. Returns (id, group_id).

    Two physical strategies:

    * pair set fits on the driver (≤ ``driver_union_find_limit``; dup
      pairs are a tiny fraction of any real corpus — the quadratic
      work already happened in candidate generation): collect → union-
      find → broadcast-join the group map back. One pass, no iterative
      shuffles.
    * otherwise: iterative min-label propagation over joins (the
      standard CC-by-joins loop; O(component diameter) rounds, lineage
      truncated per round).
    """
    # one action probes size AND fetches the edges (limit+1 rows max):
    # no separate count job, no recompute of the candidate DAG
    edges = pairs.select("id_a", "id_b").limit(driver_union_find_limit + 1).collect()
    if len(edges) <= driver_union_find_limit:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edges:
            ra, rb = find(r["id_a"]), find(r["id_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        mapping = [(x, find(x)) for x in list(parent)]
        if not mapping:
            return ids.select(F.col(id_col), F.col(id_col).alias("group_id"))
        # The group map is bounded by 2 ids per collected edge, i.e.
        # ≤ 2·driver_union_find_limit entries ≈ tens of MB at the 2M
        # ceiling — safely broadcastable. Enforce the bound so a future
        # limit bump can't silently turn this into a multi-GB broadcast
        # (past ~10M entries the label-propagation path is the answer).
        assert len(mapping) <= 2 * driver_union_find_limit, (
            f"group map {len(mapping):,} entries exceeds the broadcast "
            f"contract; lower driver_union_find_limit (got "
            f"{driver_union_find_limit:,}) to route to label propagation"
        )
        spark = ids.sparkSession
        id_type = ids.schema[id_col].dataType
        mdf = spark.createDataFrame(
            mapping,
            T.StructType(
                [T.StructField(id_col, id_type), T.StructField("_grp", id_type)]
            ),
        )
        return ids.join(F.broadcast(mdf), id_col, "left").select(
            F.col(id_col), F.coalesce("_grp", F.col(id_col)).alias("group_id")
        )
    return _cc_label_propagation(pairs, ids, id_col, max_iter)


def _cc_label_propagation(pairs: DataFrame, ids: DataFrame, id_col: str, max_iter: int = 20) -> DataFrame:
    """Distributed min-label propagation (fallback for huge pair sets)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()  # re-joined every propagation round
    )
    labels = ids.select(F.col(id_col).alias("src"), F.col(id_col).alias("group_id"))
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.min("group_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "src", "left")
            .select("src", F.least("group_id", F.coalesce("nbr_min", "group_id")).alias("group_id"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.group_id") != F.col("o.group_id"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # truncate lineage per round
        if changed == 0:
            break
    return labels.select(F.col("src").alias(id_col), "group_id")


def kgram_position_hashes(
    df: DataFrame, text_col: str, out_col: str = "gram_hashes", k: int = 8
) -> DataFrame:
    """Per-POSITION k-gram hashes (no winnowing): element i of the
    output array is the polynomial hash of the k bytes starting at
    0-based offset i of the normalized text — the raw material for
    duplicated-SPAN extraction (:func:`duplicated_spans`), where
    :func:`winnow_fingerprints` would discard the position/contiguity
    information the diagonal-run step needs.

    Same uint64-wraparound polynomial as the winnowing kernel (base
    1000003 over utf-8 bytes of the whitespace-normalized, lowercased
    text), vectorized with sliding_window_view; values are emitted as
    the signed-int64 view so they live in a Spark LongType column.
    SQL-replayable exactly (the DuckDB replays live inline in
    plans/llm_queries.py::_q65_oracle and ::_q373_oracle)
    because the k power constants mod 2^64 are plain integers."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    B = np.uint64(1_000_003)

    @F.pandas_udf(ArrayType(LongType()))
    def _hashes(texts):  # pd.Series[str] -> pd.Series[list[int]]
        from numpy.lib.stride_tricks import sliding_window_view

        powers = (B ** np.arange(k - 1, -1, -1, dtype=np.uint64))[None, :]
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                s = " ".join(str(t or "").lower().split())
                data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                if len(data) < k:
                    out.append([])
                    continue
                grams = sliding_window_view(data, k).astype(np.uint64)
                out.append((grams * powers).sum(axis=1).view(np.int64).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, _hashes(F.col(text_col)))


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_span: int = 14,
    max_doc_freq: float = 0.05,
    max_docs_per_gram: int = 64,
    top_n: int = 100,
) -> DataFrame:
    """Exact duplicated-substring extraction between document pairs —
    the ExactSubstr idea (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better") in its distributed
    diagonal-run form instead of a suffix array:

    1. hash every k-gram position (:func:`kgram_position_hashes`),
    2. drop hashes present in more than ``max_doc_freq`` of documents
       AND in more than ``max_docs_per_gram`` documents ABSOLUTELY
       (boilerplate grams are exactly the quadratic join hot spots —
       the same IDF-style guard as winnowing/LSH). The absolute cap is
       load-bearing at scale: a fraction-only gate grows with the
       corpus, so the per-gram pair fan-out (O(bucket²)) silently goes
       quadratic — the r11 8× octave found exactly that (a 0.05 cap at
       40k docs permits 2000-doc buckets → 2M pairs per gram, spilling
       the host); capped at 64 the fan-out is ≤ 2k pairs per gram
       forever,
    3. equi-join positions across documents on the hash (the only
       shuffle), and
    4. collapse matches on the same DIAGONAL (pos_a - pos_b) into
       maximal consecutive runs with one window pass: a run of r
       consecutive matching grams is a shared substring of r + k - 1
       characters.

    Returns per-pair span accounting: ``n_spans``, ``max_span_len``,
    ``dup_chars`` (sum of span lengths), top-``top_n`` pairs by
    (max_span_len DESC, id_a, id_b). Exact for non-colliding grams
    (64-bit polynomial over ASCII; collisions would need ~2^32
    distinct grams by birthday bound)."""
    from pyspark.sql import Window as W

    fp = kgram_position_hashes(
        _at_parallelism(df.select(id_col, text_col)), text_col, k=k
    ).select(F.col(id_col).alias("_id"), "gram_hashes")
    # persist the exploded hash relation: it feeds the doc-frequency
    # gate AND both sides of the self-join — without it the pandas-UDF
    # hashing pass runs three times over the corpus. _at_parallelism
    # widens the UDF pass itself when the scan arrives narrow (r14).
    ex = fp.select(
        "_id", F.posexplode("gram_hashes").alias("pos", "h")
    ).persist()
    n_docs = df.select(id_col).count()
    cap = min(max(int(n_docs * max_doc_freq), 2), max_docs_per_gram)
    # gate inverted (r14, guide §3.1): anti-join the TINY persisted
    # hot set (grams in > cap docs) instead of inner-joining the huge
    # rare set — identical surviving rows, the broadcast side shrinks
    # from ~every distinct gram to the capped hot list, and the
    # persist keeps the gate's full-relation distinct-aggregation from
    # running once per self-join side.
    hot = (
        ex.groupBy("h")
        .agg(F.countDistinct("_id").alias("_df"))
        .filter(F.col("_df") > cap)
        .select("h")
        .persist()
    )
    ex = ex.join(hot, "h", "left_anti")
    a = ex.select(F.col("_id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = ex.select(F.col("_id").alias("id_b"), F.col("pos").alias("pos_b"), "h")
    matches = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b", (F.col("pos_a") - F.col("pos_b")).alias("diag"))
    )
    w = W.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = (
        matches.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.col("pos_a") - F.col("rn"))
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg(
            (F.count("*") + F.lit(k - 1)).alias("span_len"),
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
        )
        .filter(F.col("span_len") >= min_span)
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_spans"),
            F.max("span_len").alias("max_span_len"),
            F.sum("span_len").alias("dup_chars"),
        )
        .orderBy(F.desc("max_span_len"), "id_a", "id_b")
        .limit(top_n)
    )
