"""LLM-data-pipeline operator tests: recall of the probabilistic
methods against exact baselines, plus UDF/batch plumbing edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    from ent_fins_lakehouse_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    from ent_fins_lakehouse_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    """Unblocked exact unigram-Jaccard ≥0.9 pairs (ground truth)."""
    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_blocked

    blocked = docs.withColumn("_all", F.lit(1))
    return {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs_blocked(blocked, "doc_id", "text", ["_all"], 0.9).collect()
    }


def test_minhash_recall_and_precision(docs, exact_pairs):
    from ent_fins_lakehouse_spark.operators.dedup import minhash_lsh_pairs

    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", num_hash_tables=16).collect()
    }
    assert exact_pairs, "ground truth should be non-empty at sf0.001"
    # verify_exact makes precision exact
    assert got <= exact_pairs, f"false positives: {sorted(got - exact_pairs)[:5]}"
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(exact_pairs)} true pairs"


def test_simhash_finds_exact_dups(docs, spark):
    from ent_fins_lakehouse_spark.operators.dedup import simhash_pairs

    # plant exact duplicates: simhash distance 0 must catch them
    base = docs.limit(5).select("doc_id", "text")
    dup = base.withColumn("doc_id", F.col("doc_id") + 10000)
    planted = base.unionByName(dup)
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(planted, "doc_id", "text", max_hamming=0).collect()}
    for r in base.collect():
        assert (r["doc_id"], r["doc_id"] + 10000) in got


def test_connected_components_union_find(spark):
    from ent_fins_lakehouse_spark.operators.dedup import dedup_connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id LONG")
    got = {r["doc_id"]: r["group_id"] for r in dedup_connected_components(pairs, ids, "doc_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_ann_lsh_recall_vs_bruteforce(emb):
    from ent_fins_lakehouse_spark.operators.similarity import ann_topk_lsh, cosine_topk

    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    exact = [r["vec_id"] for r in cosine_topk(emb, "embedding", list(q), 10, "vec_id").collect()]
    approx = [r["vec_id"] for r in ann_topk_lsh(emb, "embedding", list(q), 10, "vec_id", num_tables=8).collect()]
    # LSH on 64-dim random data: expect the query itself + decent overlap
    assert exact[0] == 0
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_ivf_full_probe_is_exact(emb):
    from ent_fins_lakehouse_spark.operators.similarity import build_ivf_index, cosine_topk, ivf_topk

    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    exact = [r["vec_id"] for r in cosine_topk(emb, "embedding", list(q), 10, "vec_id").collect()]
    indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=8)
    full = [r["vec_id"] for r in ivf_topk(indexed, centroids, "embedding", list(q), 10, "vec_id", n_probe=8).collect()]
    assert full == exact  # probing every cluster = brute force
    part = [r["vec_id"] for r in ivf_topk(indexed, centroids, "embedding", list(q), 10, "vec_id", n_probe=3).collect()]
    recall = len(set(part) & set(exact)) / 10
    assert recall >= 0.3, f"n_probe=3 recall {recall}"


def test_language_id_shape(docs):
    from ent_fins_lakehouse_spark.functions.text import LANG_PROFILES, language_id

    out = language_id(docs.limit(20), "text")
    rows = out.select("lang_pred").distinct().collect()
    assert all(r["lang_pred"] in LANG_PROFILES for r in rows)


def test_quality_metrics_edges(spark):
    from ent_fins_lakehouse_spark.functions.text import quality_metrics

    df = spark.createDataFrame(
        [(1, "The cat. And THE dog!"), (2, "xyz")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r.asDict() for r in quality_metrics(df, "text").collect()}
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["stopword_ratio"] == pytest.approx(0.6)  # the, and, the / 5 words
    assert 0 < r1["punct_ratio"] < 0.2
    assert out[2]["punct_ratio"] == 0.0
    assert out[2]["mean_word_len"] == 3.0


def test_multimodal_feature_batching(docs, spark):
    from ent_fins_lakehouse_spark.operators.multimodal import extract_features, to_binary_column

    env = to_binary_column(docs.limit(10), "text", "doc_id")
    feats = extract_features(env).collect()
    assert len(feats) == 10
    src = {r["doc_id"]: r["text"] for r in docs.limit(10).collect()}
    import hashlib

    for r in feats:
        raw = src[r["doc_id"]].encode("utf-8")
        assert r["byte_len"] == len(raw)
        assert r["checksum"] == hashlib.md5(raw).hexdigest()
        assert r["byte_mean"] == pytest.approx(sum(raw) / len(raw))


def test_decode_image_is_stubbed():
    from ent_fins_lakehouse_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG fake")


def test_winnow_guarantee_and_identity(spark):
    """Shared substrings >= k+window-1 chars must share a fingerprint;
    disjoint-alphabet docs must share none."""
    from ent_fins_lakehouse_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    common = "zqxjvkwpfyg hbdmctlnrs"  # 22-char shared block
    docs = spark.createDataFrame(
        [
            (1, f"aaaa {common} aaaa"),
            (2, f"eeee oooo {common}"),  # same block, shifted position
            (3, "iiii uuuu 0000 1111 2222"),  # disjoint alphabet
        ],
        "doc_id LONG, text STRING",
    )
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_fingerprints(docs, "text").collect()}
    assert fps[1] & fps[2], "winnowing guarantee violated"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # identical text -> identical fingerprint set
    dup = spark.createDataFrame([(9, f"aaaa {common} aaaa")], "doc_id LONG, text STRING")
    fps9 = set(winnow_fingerprints(dup, "text").collect()[0]["fingerprints"])
    assert fps9 == fps[1]
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(docs, "doc_id", "text", min_shared=1).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_resize_deterministic_and_sized(spark):
    from ent_fins_lakehouse_spark.operators.multimodal import resize_images, to_binary_column

    docs = spark.createDataFrame(
        [(1, "short"), (2, "a much longer document body " * 10), (3, "")],
        "doc_id LONG, text STRING",
    )
    env = to_binary_column(docs, "text", "doc_id")
    out = {r["doc_id"]: r for r in resize_images(env, 4, 4).collect()}
    assert all(len(r["payload"]) == 4 * 4 * 3 for r in out.values())
    # bit-reproducible
    again = {r["doc_id"]: r["checksum"] for r in resize_images(env, 4, 4).collect()}
    assert again == {k: v["checksum"] for k, v in out.items()}


def test_sample_frames_fanout_accounting(spark):
    from ent_fins_lakehouse_spark.operators.multimodal import sample_frames, to_binary_column

    text = "x" * 200  # 200 bytes -> chunks of 64: [64,64,64,8]; keep 0,2
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    env = to_binary_column(docs, "text", "doc_id")
    rows = sample_frames(env.select("doc_id", "payload"), 64, 2).collect()
    assert [(r["frame_idx"], r["frame_len"]) for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        (0, 64),
        (2, 64),
    ]


def test_sentence_udtf_lateral(spark):
    from ent_fins_lakehouse_spark.functions.udxf import sentence_udtf

    spark.udtf.register("split_sentences", sentence_udtf())
    spark.createDataFrame(
        [(1, "One. Two. Three"), (2, "Solo"), (3, None)], "doc_id LONG, text STRING"
    ).createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["sentence_idx"], r["sentence"])
        for r in spark.sql(
            "SELECT doc_id, sentence_idx, sentence FROM udtf_docs, LATERAL split_sentences(text)"
        ).collect()
    }
    assert got == {(1, 0, "One"), (1, 1, "Two"), (1, 2, "Three"), (2, 0, "Solo")}


def test_weighted_mean_udaf_groups_and_window(spark):
    from ent_fins_lakehouse_spark.functions.udxf import weighted_mean_udaf

    wm = weighted_mean_udaf()
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0)],
        "k STRING, v DOUBLE, w DOUBLE",
    )
    got = {r["k"]: r["wmean"] for r in df.groupBy("k").agg(wm("v", "w").alias("wmean")).collect()}
    assert got["a"] == (1 * 1 + 3 * 3) / 4 and got["b"] == 10.0


def test_connected_components_label_propagation_path(spark):
    """Force the distributed fallback (limit=0) — must agree with the
    union-find result on a graph with chains, cycles and singletons."""
    from ent_fins_lakehouse_spark.operators.dedup import dedup_connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (22, 20)],
        "id_a LONG, id_b LONG",
    )
    ids = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]], "doc_id LONG"
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 99: 99}
    lp = {
        r["doc_id"]: r["group_id"]
        for r in dedup_connected_components(
            pairs, ids, "doc_id", driver_union_find_limit=0
        ).collect()
    }
    assert lp == want


def test_connected_components_string_ids(spark):
    """ADVICE r1: the driver-side union-find path must honor the id
    column's actual type (was hardcoded LONG)."""
    from ent_fins_lakehouse_spark.operators.dedup import dedup_connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a STRING, id_b STRING"
    )
    ids = spark.createDataFrame([("a",), ("b",), ("c",), ("x",), ("y",), ("z",)], "doc STRING")
    out = {r["doc"]: r["group_id"] for r in dedup_connected_components(pairs, ids, "doc").collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_blockwise_numpy_cosine_matches_codegen_path(spark):
    """q130 (applyInPandas + BLAS) must produce the same top-100 pair
    set as q63 (per-pair codegen fold) — same logical operator, two
    physical strategies. With rescore_exact the emitted cosines are
    recomputed via the same codegen fold, so values are bit-identical
    (q130 shares q63's DuckDB oracle on that basis)."""
    from ent_fins_lakehouse_spark.plans.registry import QUERIES, _load_all

    _load_all()
    sf = "/root/testdata/sf0.001"
    exact = QUERIES["q63_embedding_near_dup"].fn(spark, sf).collect()
    fast = QUERIES["q130_blockwise_cosine_topk"].fn(spark, sf).collect()
    exact_m = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in exact}
    fast_m = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in fast}
    assert set(exact_m) == set(fast_m)
    for k, v in exact_m.items():
        assert v == fast_m[k], (k, v.hex(), fast_m[k].hex())


def test_bounded_blocks_subshard_is_exact(docs):
    """Triangle hash-sub-sharding (forced via a tiny cap) must return
    the identical pair set as the unsharded join — the cap bounds
    per-task work, never the result."""
    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_blocked

    blocked = docs.withColumn("_all", F.lit(1))
    base = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in jaccard_pairs_blocked(blocked, "doc_id", "text", ["_all"], 0.9).collect()
    }
    sharded = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in jaccard_pairs_blocked(
            blocked, "doc_id", "text", ["_all"], 0.9, max_block_size=50
        ).collect()
    }
    assert base, "ground truth should be non-empty at sf0.001"
    assert sharded == base


def test_bounded_blocks_raise_mode(docs):
    """on_oversize='raise' rejects oversized blocks eagerly at plan
    time with routing guidance toward the LSH path."""
    from ent_fins_lakehouse_spark.operators.blocking import BlockSizeExceededError
    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_blocked

    blocked = docs.withColumn("_all", F.lit(1))
    with pytest.raises(BlockSizeExceededError, match="max_block_size"):
        jaccard_pairs_blocked(
            blocked, "doc_id", "text", ["_all"], 0.9, max_block_size=50, on_oversize="raise"
        )


def test_total_pairs_guard_routes_to_lsh(docs):
    """The census guard refuses workloads past max_total_pairs in
    either mode — exact all-pairs at that scale is a misrouted job."""
    from ent_fins_lakehouse_spark.operators.blocking import BlockSizeExceededError
    from ent_fins_lakehouse_spark.operators.dedup import jaccard_pairs_blocked

    blocked = docs.withColumn("_all", F.lit(1))
    with pytest.raises(BlockSizeExceededError, match="minhash_lsh_pairs"):
        jaccard_pairs_blocked(
            blocked, "doc_id", "text", ["_all"], 0.9, max_total_pairs=1000
        )


def test_cosine_bounded_blocks_subshard_is_exact(emb):
    """Same triangle-sharding exactness contract for the embedding
    exact-pair operator."""
    from ent_fins_lakehouse_spark.operators.similarity import cosine_pairs_blocked

    base = {
        (r["id_a"], r["id_b"], round(r["cosine_sim"], 12))
        for r in cosine_pairs_blocked(
            emb, "vec_id", "embedding", ["label"], top_n=100
        ).collect()
    }
    sharded = {
        (r["id_a"], r["id_b"], round(r["cosine_sim"], 12))
        for r in cosine_pairs_blocked(
            emb, "vec_id", "embedding", ["label"], top_n=100, max_block_size=10
        ).collect()
    }
    assert base and sharded == base


def test_zero_norm_vectors_dropped_in_both_strategies(spark):
    """ADVICE r2: the codegen and BLAS paths must agree on zero-norm
    vectors — both drop them (cosine undefined), so neither emits a
    NULL/0.0 pair the other lacks."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_blockwise_numpy,
    )

    rows = [
        (1, [1.0, 0.0], "x"),
        (2, [1.0, 0.0], "x"),
        (3, [0.0, 0.0], "x"),  # zero-norm: must pair with nothing
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>, label STRING")
    exact = cosine_pairs_blocked(df, "vec_id", "embedding", ["label"]).collect()
    fast = cosine_pairs_blockwise_numpy(df, "vec_id", "embedding", ["label"]).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 2)}
    assert {(r["id_a"], r["id_b"]) for r in fast} == {(1, 2)}


def test_quantize_int8_bounds_and_error(emb):
    """Quantized components stay in [-127, 127]; per-element
    dequantization error is <= scale/2 (the half-step bound of
    round-to-nearest)."""
    from ent_fins_lakehouse_spark.operators.similarity import dequantize, quantize_int8

    qz = quantize_int8(emb.select("vec_id", "embedding"), "embedding")
    stats = qz.select(
        F.array_max(F.transform("qvec", lambda i: F.abs(i))).alias("max_abs_q"),
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize("qvec", "qscale"),
                lambda x, d: F.abs(x - d),
            )
        ).alias("max_err"),
        F.col("qscale"),
    ).agg(
        F.max("max_abs_q").alias("q_bound"),
        F.max(F.col("max_err") / F.col("qscale")).alias("worst_halfsteps"),
    ).head()
    assert stats["q_bound"] <= 127
    assert stats["worst_halfsteps"] <= 0.5 + 1e-9


def test_quantized_ann_recall_vs_exact(emb):
    """Filter-then-rescore over int8 candidates recovers the exact
    brute-force top-10 (int8 on 64-dim unit-ish vectors loses far less
    ranking signal than the 5x candidate margin)."""
    from ent_fins_lakehouse_spark.operators.similarity import cosine_topk, quantized_ann_topk

    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = [r["vec_id"] for r in cosine_topk(emb, "embedding", qvec, 10, "vec_id").collect()]
    approx = [
        r["vec_id"]
        for r in quantized_ann_topk(emb, "vec_id", "embedding", qvec, k=10, n_candidates=50).collect()
    ]
    assert set(approx) == set(exact)
    # rescoring is exact, so the final ordering must match exactly
    assert approx == exact


def test_weighted_sample_deterministic_and_biased(spark):
    """q143's sampler: identical across reruns (md5-keyed, not RNG) and
    actually weight-biased (docs above the median weight are kept at a
    higher rate than docs below)."""
    from ent_fins_lakehouse_spark.plans.llm_queries import q143_weighted_sample

    a = q143_weighted_sample(spark, SF_SMOKE).collect()
    b = q143_weighted_sample(spark, SF_SMOKE).collect()
    assert a == b
    from ent_fins_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    med = docs.agg(F.median("n_chars")).head()[0]
    kept = {r["doc_id"] for r in a}
    rows = docs.collect()
    hi = [r for r in rows if r["n_chars"] > med]
    lo = [r for r in rows if r["n_chars"] <= med]
    rate_hi = sum(r["doc_id"] in kept for r in hi) / max(len(hi), 1)
    rate_lo = sum(r["doc_id"] in kept for r in lo) / max(len(lo), 1)
    assert rate_hi > rate_lo


def test_ivf_partitioned_serving_matches_inmemory_probe(spark, emb):
    """q144's payload is the exact top-10 (the hash-checkable half of
    the r12 hard-signal shape), its in-plan recall flag is TRUE, and
    the pruned-layout probe tier still returns exactly what the
    in-memory IVF probe (q60's operator) returns for the same index
    parameters."""
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk,
        with_cosine,
    )
    from ent_fins_lakehouse_spark.plans.llm_queries import (
        _centroid_probe,
        _ivf_sq8_layout,
        q144_ivf_partitioned_serving,
    )

    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    rows = q144_ivf_partitioned_serving(spark, SF_SMOKE).collect()
    assert all(r["ivf_serving_recall_ok"] for r in rows)
    payload = [(r["vec_id"], round(r["cosine_sim"], 9)) for r in rows]
    exact = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in cosine_topk(emb, "embedding", qvec, 10, "vec_id").collect()
    ]
    assert payload == exact
    # the serving tier itself: pruned-layout probe == in-memory probe
    path, centroids = _ivf_sq8_layout(spark, SF_SMOKE, n_clusters=8)
    probe = _centroid_probe(centroids, qvec, n_probe=4)
    served = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in with_cosine(
            spark.read.parquet(path).filter(F.col("ivf_cluster").isin(probe)),
            "embedding",
            qvec,
        )
        .select("vec_id", "cosine_sim")
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    indexed, centroids2 = build_ivf_index(emb, "embedding", n_clusters=8)
    mem = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in ivf_topk(indexed, centroids2, "embedding", qvec, 10, "vec_id", n_probe=4).collect()
    ]
    assert served == mem


def test_quantized_ann_rejects_zero_query(emb):
    """An all-zero query has no cosine (and no int8 scale): the
    operator must refuse with a clear error, not ZeroDivisionError."""
    from ent_fins_lakehouse_spark.operators.similarity import quantized_ann_topk

    with pytest.raises(ValueError, match="all zeros"):
        quantized_ann_topk(emb, "vec_id", "embedding", [0.0] * 64, k=10)


def test_ivf_sq8_layout_is_amortized(spark):
    """The serving layout is built once per dataset and REUSED: a
    second probe must not rewrite the parquet (index builds amortize
    across queries — the q144/q148 production contract)."""
    import os

    from ent_fins_lakehouse_spark.plans.llm_queries import _ivf_sq8_layout

    path1, cents1 = _ivf_sq8_layout(spark, SF_SMOKE, n_clusters=8)
    marker = os.path.join(path1, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    path2, cents2 = _ivf_sq8_layout(spark, SF_SMOKE, n_clusters=8)
    assert path2 == path1
    assert cents2 == cents1
    assert os.path.getmtime(marker) == mtime, "layout was rebuilt on reuse"


def test_serving_layout_is_content_addressed_across_sessions(spark, tmp_path):
    """VERDICT r11 item 4: the serving layout address is keyed by
    (dataset fingerprint, index params) — NOT the pid — so a second
    fresh session serves probes from the first session's build. The
    build-count marker (built_by.json) pins the no-rebuild claim, and
    a mutated dataset must address a DIFFERENT layout."""
    import json
    import os
    import shutil
    import time

    from ent_fins_lakehouse_spark.plans.llm_queries import (
        _dataset_fingerprint,
        _ivf_sq8_layout,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.copy(
        os.path.join(SF_SMOKE, "embeddings.parquet"),
        os.path.join(sf, "embeddings.parquet"),
    )
    path1, cents1 = _ivf_sq8_layout(spark, sf, n_clusters=8)
    root1 = os.path.dirname(path1)
    # pid-free address: any fresh process computes the same path
    assert f"p{os.getpid()}" not in os.path.basename(root1)
    marker = os.path.join(root1, "built_by.json")
    built = json.load(open(marker))
    m0 = os.path.getmtime(marker)
    # a "fresh session" is indistinguishable from a re-call here: the
    # function keeps NO in-process state — reuse is decided purely by
    # the content-addressed directory, which a second pid resolves
    # identically
    path2, cents2 = _ivf_sq8_layout(spark, sf, n_clusters=8)
    assert (path2, cents2) == (path1, cents1)
    assert os.path.getmtime(marker) == m0 and json.load(open(marker)) == built
    # different params -> different address
    path3, _ = _ivf_sq8_layout(spark, sf, n_clusters=4)
    assert os.path.dirname(path3) != root1
    # mutated dataset -> different fingerprint -> fresh layout
    fp_before = _dataset_fingerprint(sf)
    t = time.time() + 5
    os.utime(os.path.join(sf, "embeddings.parquet"), (t, t))
    assert _dataset_fingerprint(sf) != fp_before
    for r in (root1, os.path.dirname(path3)):
        shutil.rmtree(r, ignore_errors=True)


def test_ivf_sq8_serving_recall_and_rescore(spark, emb):
    """q148's two in-plan invariants hold: ``rescore_tier_exact`` (the
    int8-probe + exact-rescore top-10 EQUALS the exact-over-probed-
    clusters top-10 — the quantized prefilter cannot cost ranking
    fidelity at this scale) and ``sq8_recall_ok``; the payload is the
    exact global top-10."""
    from ent_fins_lakehouse_spark.operators.similarity import cosine_topk
    from ent_fins_lakehouse_spark.plans.llm_queries import q148_ivf_sq8_serving

    rows = q148_ivf_sq8_serving(spark, SF_SMOKE).collect()
    assert all(r["rescore_tier_exact"] for r in rows)
    assert all(r["sq8_recall_ok"] for r in rows)
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = [
        (r["vec_id"], round(r["cosine_sim"], 9))
        for r in cosine_topk(emb, "embedding", qvec, 10, "vec_id").collect()
    ]
    assert [(r["vec_id"], round(r["cosine_sim"], 9)) for r in rows] == exact


def test_ivf_blocked_near_dup_recall(spark, emb):
    """q151's contract: NEAR-IDENTICAL vectors co-locate in a KMeans
    cell, so planted near-dup pairs (cosine ~1, far above the ~0.48
    background max of the synthetic corpus) are all recovered by the
    cell-blocked kernel — and every emitted score is exact."""
    from pyspark.sql import functions as FF

    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_pairs_blocked,
        cosine_pairs_blockwise_numpy,
    )

    # plant 10 near-duplicates: copies of vec_id 0..9, scaled +0.1% —
    # same direction, cosine ~0.9999998
    base = emb.select("vec_id", "embedding")
    dup = base.filter(FF.col("vec_id") < 10).select(
        (FF.col("vec_id") + 100000).alias("vec_id"),
        FF.transform("embedding", lambda x: x * FF.lit(1.001)).alias("embedding"),
    )
    corpus = base.unionByName(dup)
    indexed, _ = build_ivf_index(corpus, "embedding", n_clusters=8)
    got = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_pairs_blockwise_numpy(
            indexed, "vec_id", "embedding", ["ivf_cluster"], top_n=100
        ).collect()
    }
    planted = {(i, i + 100000) for i in range(10)}
    found = planted & set(got)
    assert len(found) == 10, f"planted near-dups missed: {sorted(planted - found)}"
    for k in found:
        assert got[k] > 0.999
    # scores are exact: agree with the codegen'd per-pair kernel on the
    # same blocking to 1e-9
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in cosine_pairs_blocked(
            indexed, "vec_id", "embedding", ["ivf_cluster"], top_n=100
        ).collect()
    }
    assert set(exact) == set(got)
    for k in got:
        assert abs(got[k] - exact[k]) < 1e-9


def test_semantic_dedup_keeps_one_per_group(spark, emb):
    """q157's pipeline on a corpus with planted near-identical vectors:
    each planted pair collapses to its min-id representative, and
    re-running on the kept set is a fixpoint (all singletons)."""
    from pyspark.sql import functions as FF

    from ent_fins_lakehouse_spark.operators.dedup import dedup_connected_components
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_pairs_blockwise_numpy,
    )

    def run(corpus):
        indexed, _ = build_ivf_index(corpus, "embedding", n_clusters=8)
        pairs = cosine_pairs_blockwise_numpy(
            indexed, "vec_id", "embedding", ["ivf_cluster"], min_cosine=0.95
        )
        groups = dedup_connected_components(pairs, corpus.select("vec_id"), "vec_id")
        return (
            groups.groupBy("group_id")
            .agg(FF.min("vec_id").alias("vec_id"), FF.count("*").alias("n_members"))
        )

    base = emb.select("vec_id", "embedding")
    dup = base.filter(FF.col("vec_id") < 10).select(
        (FF.col("vec_id") + 100000).alias("vec_id"),
        FF.transform("embedding", lambda x: x * FF.lit(1.001)).alias("embedding"),
    )
    kept = run(base.unionByName(dup))
    rows = {r["vec_id"]: r["n_members"] for r in kept.collect()}
    # every planted copy collapsed onto its original (min id)
    for i in range(10):
        assert rows.get(i) == 2, f"vec {i}: {rows.get(i)}"
        assert i + 100000 not in rows
    # fixpoint: dedup of the kept set is all singletons
    kept_corpus = base.unionByName(dup).join(
        kept.select("vec_id"), "vec_id", "semi"
    )
    again = run(kept_corpus)
    assert again.filter(FF.col("n_members") > 1).count() == 0


def test_pq_ann_recall_and_compression(spark):
    """PQ ADC + rerank: recall vs exact top-10 must be high (the
    rerank pass rescores true cosines, so any hit in the candidate set
    surfaces exactly); codes are m small ints; the returned scores ARE
    the exact cosines of the survivors."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.similarity import (
        build_pq_codebooks,
        cosine_topk,
        pq_encode,
        pq_topk,
    )
    from ent_fins_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 7).select("embedding").head()[0])
    exact = {r["vec_id"]: r["cosine_sim"] for r in cosine_topk(emb, "embedding", qvec, 10, "vec_id").collect()}

    books = build_pq_codebooks(emb, "embedding", m=8, k=16)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    enc = pq_encode(emb.select("vec_id", "embedding"), "embedding", books)
    row = enc.first()
    assert len(row["pq_codes"]) == 8
    assert all(0 <= c < 16 for c in row["pq_codes"])
    got = {r["vec_id"]: r["cosine_sim"] for r in pq_topk(enc, emb, books, "embedding", qvec, 10, "vec_id", rerank=50).collect()}
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.7, f"PQ recall {recall} too low"
    # scores of common hits are the EXACT cosines (rerank guarantees it)
    for vid in set(got) & set(exact):
        assert abs(got[vid] - exact[vid]) < 1e-9
    # determinism: same seed → same codebooks → same result
    books2 = build_pq_codebooks(emb, "embedding", m=8, k=16)
    assert books == books2


def test_ivf_pq_serving_recall(spark):
    """IVF-PQ serving under the r12 hard-signal shape: the in-plan
    recall flag is TRUE and the payload is the exact top-10 with exact
    cosines."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.similarity import cosine_topk
    from ent_fins_lakehouse_spark.plans.registry import queries_map
    from ent_fins_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    exact = {
        r["vec_id"]: r["cosine_sim"]
        for r in cosine_topk(emb, "embedding", qvec, 10, "vec_id").collect()
    }
    rows = queries_map()["q188_ivf_pq_serving"](spark, SF_SMOKE).collect()
    assert all(r["ivf_pq_recall_ok"] for r in rows)
    got = {r["vec_id"]: r["cosine_sim"] for r in rows}
    assert set(got) == set(exact)
    for vid in exact:
        assert abs(got[vid] - exact[vid]) < 1e-9


def test_dsir_weights_favor_target_domain(spark):
    """DSIR importance weights must rank in-domain (en) docs above
    out-of-domain ones on average: mean log_w of en docs > mean log_w
    of non-en docs, and the Gumbel top-k selection must be
    deterministic across invocations."""
    from ent_fins_lakehouse_spark.plans.llm_queries import q192_dsir_selection
    from ent_fins_lakehouse_spark.sources.readers import load_table

    from tests.conftest import SF_ORACLE as sf_dir

    sel1 = q192_dsir_selection(spark, sf_dir).collect()
    sel2 = q192_dsir_selection(spark, sf_dir).collect()
    assert [r["doc_id"] for r in sel1] == [r["doc_id"] for r in sel2]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    lang = {r["doc_id"]: r["lang"] for r in docs.collect()}
    n_en = sum(1 for r in sel1 if lang[r["doc_id"]] == "en")
    # the corpus is ~44% en; an importance-resampled top-50 must be
    # heavily enriched toward the target domain
    assert n_en >= 30, f"only {n_en}/50 selected docs are in-domain"


def test_ccnet_buckets_partition_each_language(spark):
    """q210: every doc gets exactly one bucket; within each language the
    head third must outscore the tail third, and all three buckets are
    non-empty (the distributional contract CCNet downstreams rely on)."""
    from ent_fins_lakehouse_spark.plans.registry import queries_map

    from tests.conftest import SF_ORACLE

    rows = queries_map()["q210_ccnet_bucketing"](spark, SF_ORACLE).collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(r["avg_logp"])
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, (lang, set(buckets))
        assert min(buckets["head"]) >= max(buckets["tail"]), lang


def test_k_anonymity_released_groups_are_large(spark):
    """q212: after suppression, every released (non-'*') quasi-identifier
    combination must cover >= k documents — the k-anonymity guarantee
    itself, checked on the operator's output."""
    from collections import Counter

    from ent_fins_lakehouse_spark.plans.registry import queries_map

    from tests.conftest import SF_ORACLE

    rows = queries_map()["q212_k_anonymity"](spark, SF_ORACLE).collect()
    released = Counter(
        (r["lang"], r["source_anon"], r["size_anon"])
        for r in rows
        if r["source_anon"] != "*"
    )
    assert released, "expected at least one released group at sf0.01"
    assert min(released.values()) >= 5
    assert any(r["source_anon"] == "*" for r in rows), "expected suppression"


def test_mmr_rerank_diversity_invariant(spark):
    """MMR's picks must be no LESS diverse than plain cosine top-k
    (lower mean pairwise similarity), share the same #1 (at rank 0 the
    diversity term is zero), and preserve pool membership."""
    import numpy as np

    from ent_fins_lakehouse_spark.operators.similarity import cosine_topk
    from ent_fins_lakehouse_spark.plans.llm_queries import q224_mmr_rerank
    from ent_fins_lakehouse_spark.sources.readers import load_table

    out = q224_mmr_rerank(spark, SF_SMOKE).collect()
    assert [r["rank"] for r in out] == list(range(10))
    sel = [r["vec_id"] for r in out]
    assert len(set(sel)) == 10

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    plain = [
        r["vec_id"]
        for r in cosine_topk(
            emb.filter(F.col("vec_id") != 0), "embedding", qvec, 10, "vec_id"
        ).collect()
    ]
    assert sel[0] == plain[0]  # rank-0 pick is pure relevance

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(sel + plain)).collect()
    }

    def mean_pairwise(ids):
        V = np.array([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
        S = V @ V.T
        n = len(ids)
        return (S.sum() - n) / (n * (n - 1))

    assert mean_pairwise(sel) <= mean_pairwise(plain) + 1e-12


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich et al. 2016 reference implementation (pure Python):
    the ground truth the distributed trainer must reproduce
    rule-for-rule."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq <= 1:
            break
        merges.append((rank, l, r, freq))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference(spark, docs):
    import re

    from ent_fins_lakehouse_spark.plans.llm_queries import q229_bpe_train

    got = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in q229_bpe_train(spark, SF_SMOKE).collect()
    ]
    wc: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in re.split(r"[^a-z]+", r["text"].lower()):
            if len(w) >= 2:
                wc[w] = wc.get(w, 0) + 1
    want, _ = _reference_bpe(wc, 12)
    assert got == want


def test_bpe_encode_stats_invariants(spark, docs):
    import re

    from ent_fins_lakehouse_spark.plans.llm_queries import (
        q229_bpe_train,
        q230_bpe_encode_stats,
    )

    rows = q230_bpe_encode_stats(spark, SF_SMOKE).collect()
    by_tok = {r["token"]: r["freq"] for r in rows}
    total = by_tok.pop("__TOTAL_TOKENS__")
    merges = {
        (r["left"], r["right"]): r["freq"]
        for r in q229_bpe_train(spark, SF_SMOKE).collect()
    }
    # raw symbol count = sum over words of (len + 1 for </w>)
    raw = 0
    for r in docs.select("text").collect():
        for w in re.split(r"[^a-z]+", r["text"].lower()):
            if len(w) >= 2:
                raw += len(w) + 1
    # each merge with frequency f removes exactly f symbols — BUT only
    # merges applied at TRAIN time; the greedy re-encode can apply a
    # rule more or fewer times, so assert the loose direction plus
    # shrinkage
    assert total < raw
    assert total >= raw - sum(merges.values()) - len(merges)
    # every reported multi-char token is a concatenation of some
    # merge rule
    built = {l + r for (l, r) in merges} | {"</w>"}  # </w> is a base symbol
    for tok in by_tok:
        assert tok in built, f"token {tok!r} not from a learned merge"


def test_assign_ivf_clusters_matches_training_assignment(spark):
    """Incremental IVF assignment must agree with KMeans' own
    assignment: re-assigning the TRAINING vectors through
    assign_ivf_clusters reproduces every ivf_cluster id (same metric,
    same centroids), and the expression stays JVM-side (no python
    UDF in the plan)."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.similarity import (
        assign_ivf_clusters,
        build_ivf_index,
    )
    from ent_fins_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    indexed, centroids = build_ivf_index(emb, "embedding", n_clusters=4)
    re_assigned = assign_ivf_clusters(
        emb.select("vec_id", "embedding"), "embedding", centroids
    )
    joined = indexed.select("vec_id", F.col("ivf_cluster").alias("train_c")).join(
        re_assigned.select("vec_id", F.col("ivf_cluster").alias("inc_c")), "vec_id"
    )
    diff = joined.filter(F.col("train_c") != F.col("inc_c")).count()
    # ties on exact-equal distances may break differently; none exist
    # in the fixture, so assignments must agree exactly
    assert diff == 0
    plan = re_assigned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_segment_audio_slices_reassemble(spark):
    """Audio segmentation must be lossless: concatenating each doc's
    segment payloads in seg_no order reproduces the original payload
    byte-for-byte, and the time lattice tiles [0, duration) without
    gaps or overlaps. The plan stays JVM-side (no python eval)."""
    from pyspark.sql import functions as F

    from ent_fins_lakehouse_spark.operators.multimodal import (
        AUDIO_MS_PER_BYTE,
        segment_audio,
        to_binary_column,
    )
    from ent_fins_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    env = to_binary_column(docs, "text", "doc_id").select("doc_id", "payload")
    seg = segment_audio(env, segment_ms=1000)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    rows = seg.orderBy("doc_id", "seg_no").collect()
    orig = {r["doc_id"]: bytes(r["payload"]) for r in env.collect()}
    got: dict = {}
    for r in rows:
        got.setdefault(r["doc_id"], b"")
        assert r["start_ms"] == r["seg_no"] * 1000  # lattice aligned
        got[r["doc_id"]] += bytes(r["seg_payload"] or b"")
    for did, b in orig.items():
        assert got[did] == b, f"doc {did} lost bytes in segmentation"
        n_rows = sum(1 for r in rows if r["doc_id"] == did)
        import math
        assert n_rows == max(1, math.ceil(len(b) * AUDIO_MS_PER_BYTE / 1000))


def test_segment_audio_rejects_unaligned_segment_ms(spark):
    """ADVICE r7 (low): a segment_ms not divisible by AUDIO_MS_PER_BYTE
    would drift the byte lattice off the ms lattice and break lossless
    reassembly — refused loudly instead."""
    import pytest as _pytest

    from ent_fins_lakehouse_spark.operators.multimodal import segment_audio

    env = spark.createDataFrame([("d1", b"x" * 100)], "doc_id string, payload binary")
    with _pytest.raises(ValueError, match="multiple of"):
        segment_audio(env, segment_ms=4001)
    with _pytest.raises(ValueError, match="multiple of"):
        segment_audio(env, segment_ms=0)
    # aligned value still works
    assert segment_audio(env, segment_ms=8).count() > 0


def test_duplicated_spans_exact_lengths(spark):
    """duplicated_spans must recover the exact shared-substring length
    on a constructed fixture: a 40-char region copied between two docs
    (span_len == 40), a full-containment pair (span == the contained
    doc), and an unrelated pair absent."""
    from ent_fins_lakehouse_spark.operators.dedup import duplicated_spans

    shared = "the quick brown fox jumps over the dog!"  # 39 chars
    assert len(shared) == 39
    docs = spark.createDataFrame(
        [
            (1, "AAAA xxxxxxxx " + shared + " yyyyyyyy BBBB"),
            (2, "CCCC zzzzzzzz " + shared + " wwwwwwww DDDD"),
            (3, shared),  # fully contained in 1 and 2
            (4, "completely unrelated content with no overlap at all qqqq"),
        ],
        "doc_id INT, text STRING",
    )
    out = {
        (r["id_a"], r["id_b"]): (r["n_spans"], r["max_span_len"], r["dup_chars"])
        for r in duplicated_spans(
            docs, "doc_id", "text", k=8, min_span=14, max_doc_freq=1.0
        ).collect()
    }
    # docs 1<->2 share " <shared> " INCLUDING both flanking spaces (41
    # chars); doc 3 is exactly the 39-char region with no flanks
    assert out[(1, 2)][1] == 41, out
    assert out[(1, 3)][1] == 39 and out[(2, 3)][1] == 39
    assert not any(4 in k for k in out), "unrelated doc must produce no spans"


def test_weighted_reservoir_sample_is_weight_biased_and_stable(spark):
    """q375's A-ES sample: exactly k distinct docs, deterministic
    across reruns, and biased toward heavy (high-token) documents —
    the sampled mean token count must exceed the corpus mean."""
    from ent_fins_lakehouse_spark.plans.registry import QUERIES, _load_all

    _load_all()
    sf = "/root/testdata/sf0.001"
    fn = QUERIES["q375_weighted_reservoir_sample"].fn
    s1 = fn(spark, sf).collect()
    s2 = fn(spark, sf).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2], "must be deterministic"
    assert len({r["doc_id"] for r in s1}) == len(s1) == 100
    from ent_fins_lakehouse_spark.functions.text import token_count
    from ent_fins_lakehouse_spark.sources.readers import load_table

    corpus = (
        load_table(spark, sf, "documents")
        .select(token_count("text").alias("n"))
        .agg(F.avg("n"))
        .first()[0]
    )
    sampled = sum(r["n_tokens"] for r in s1) / len(s1)
    assert sampled > corpus, (sampled, corpus)


def test_duplicated_spans_absolute_cap_engages(spark):
    """The r11a scale lesson as a pinned unit test: a gram present in
    MORE docs than max_docs_per_gram must be gated out (its pairs
    vanish) even when the fractional cap would admit it — the absolute
    bound is what keeps per-gram join fan-out O(cap^2) at any corpus
    size."""
    from ent_fins_lakehouse_spark.operators.dedup import duplicated_spans

    boiler = "this exact boilerplate sentence appears everywhere ok"
    docs = spark.createDataFrame(
        [(i, f"doc number {i} unique padding {i * 7919} " + boiler) for i in range(8)],
        "doc_id INT, text STRING",
    )
    # fractional cap alone (max_doc_freq=1.0 -> cap 8) admits the
    # boilerplate gram: every pair shares the long span
    loose = duplicated_spans(
        docs, "doc_id", "text", k=8, min_span=14, max_doc_freq=1.0, max_docs_per_gram=64
    ).collect()
    assert len(loose) == 8 * 7 // 2, "all pairs share the boilerplate span"
    # absolute cap 4 < 8 docs gates the shared grams out entirely
    tight = duplicated_spans(
        docs, "doc_id", "text", k=8, min_span=14, max_doc_freq=1.0, max_docs_per_gram=4
    ).collect()
    assert tight == [], f"capped gate must drop the busy grams: {tight[:3]}"


def test_jaccard_prefix_join_equals_quadratic_ground_truth(docs):
    """The prefix-filtering all-pairs join (Bayardo WWW'07) is EXACT:
    identical pair set and identical jaccard values as the quadratic
    single-block join, at both shingle sizes — including the
    (1-t)*|s|-integer boundary where a bare IEEE floor would clip the
    prefix one short."""
    from pyspark.sql import functions as FF

    from ent_fins_lakehouse_spark.operators.dedup import (
        jaccard_pairs_blocked,
        jaccard_pairs_prefix,
    )

    blocked = docs.withColumn("_all", FF.lit(1))
    for n in (1, 3):
        quad = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_pairs_blocked(
                blocked, "doc_id", "text", ["_all"], 0.9, shingle_n=n
            ).collect()
        }
        pref = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_pairs_prefix(
                docs, "doc_id", "text", 0.9, shingle_n=n
            ).collect()
        }
        assert quad, f"ground truth empty at shingle_n={n}"
        assert pref == quad


def test_ivf_batch_topk_matches_per_query_probe(spark, emb):
    """The batched IVF probe returns, for every query, exactly what
    the per-query probe returns on the same layout parameters — one
    pruned scan for the whole batch is a plan optimization, never a
    semantic one. A table-sized query side refuses loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as FF

    from ent_fins_lakehouse_spark.operators import similarity as S
    from ent_fins_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        ivf_batch_topk,
        ivf_topk,
    )
    from ent_fins_lakehouse_spark.plans.llm_queries import _ivf_sq8_layout
    from tests.conftest import SF_SMOKE

    path, centroids = _ivf_sq8_layout(spark, SF_SMOKE, n_clusters=8)
    queries = emb.filter(FF.col("vec_id") % 100 == 0).select(
        FF.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_batch_topk(spark, path, centroids, queries, k=5, n_probe=4)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["cosine_sim"], 9))
        for r in batch.collect()
    }
    indexed, cents2 = build_ivf_index(emb, "embedding", n_clusters=8)
    assert centroids == cents2  # seeded determinism
    for q in [r["query_id"] for r in queries.select("query_id").collect()]:
        qvec = list(
            emb.filter(FF.col("vec_id") == q).select("embedding").head()[0]
        )
        single = ivf_topk(
            indexed, centroids, "embedding", qvec, k=5, id_col="vec_id", n_probe=4
        ).collect()
        for rank, r in enumerate(single, start=1):
            assert got[(q, rank)] == (r["vec_id"], round(r["cosine_sim"], 9))
    # cap: a table-sized query side is refused
    orig = S.BATCH_PROBE_MAX_QUERIES
    try:
        S.BATCH_PROBE_MAX_QUERIES = 3
        with _pytest.raises(ValueError, match="anchor set"):
            ivf_batch_topk(spark, path, centroids, queries, k=5)
    finally:
        S.BATCH_PROBE_MAX_QUERIES = orig


def test_ivf_batch_topk_boundary_ties_pick_lowest_cell(spark, tmp_path):
    """Pin for the r13 advisory find: centroid selection at the n_probe
    boundary must break sim TIES by lowest cell index (the stable
    per-query sorted() contract), not argpartition's arbitrary pick.
    Four centroids are exact scalar multiples of each other (cosine 1.0
    with the query, bit-identical after normalization); with n_probe=2
    the probed set must be cells {0, 1} — so only their rows can appear
    in the result, deterministically, run after run."""
    from pyspark.sql import functions as FF

    from ent_fins_lakehouse_spark.operators.similarity import ivf_batch_topk

    # layout: one vector per cell, all perfectly similar to the query —
    # any cell's row would score 1.0, so the probed CELLS decide the ids
    rows = [(i, i, [1.0, 0.0]) for i in range(6)]
    layout = str(tmp_path / "ivf_ties")
    spark.createDataFrame(
        rows, "vec_id LONG, ivf_cluster INT, embedding ARRAY<DOUBLE>"
    ).write.partitionBy("ivf_cluster").parquet(layout)
    centroids = [
        [2.0, 0.0],   # cos = 1.0 (tie)
        [0.5, 0.0],   # cos = 1.0 (tie)
        [1.0, 0.0],   # cos = 1.0 (tie)
        [4.0, 0.0],   # cos = 1.0 (tie)
        [0.0, 1.0],   # cos = 0.0
        [-1.0, 0.0],  # cos = -1.0
    ]
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id LONG, embedding ARRAY<DOUBLE>"
    )
    for _ in range(3):  # determinism across repeated plans
        got = sorted(
            r["vec_id"]
            for r in ivf_batch_topk(
                spark, layout, centroids, queries, k=10, n_probe=2
            ).collect()
        )
        assert got == [0, 1], got


def test_bpe_duckdb_oracle_matches_sennrich_on_overlap_corpus():
    """The q229 DuckDB WITH RECURSIVE replay's replace()-as-merge must
    reproduce the Sennrich left-to-right NON-OVERLAPPING scan exactly
    where it matters most: self-adjacent pairs ('aaa' under merge
    (a,a) -> ['aa','a'], never ['aa','aa']) — while PAIR COUNTS stay
    overlapping (2 per 'aaa'). An engineered corpus forces both
    properties through several chained self-merges; the pure-Python
    reference replay is the ground truth. No Spark involved — this
    pins the ORACLE's semantics, the driver sweep pins Spark == oracle."""
    import collections
    import re as _re

    import duckdb

    from ent_fins_lakehouse_spark.plans.registry import QUERIES, _load_all

    _load_all()
    con = duckdb.connect()
    con.execute(
        """CREATE TABLE documents AS SELECT * FROM (VALUES
        ('aaa aaa aaaa baab aab aaab'),
        ('aaa aaaa baab aab xaaay zaaaz'),
        ('aaa aaa aaa aaaa aaab baab')) t(text)"""
    )
    got = [tuple(r) for r in con.execute(QUERIES["q229_bpe_train"].oracle).fetchall()]

    texts = [r[0] for r in con.execute("SELECT text FROM documents").fetchall()]
    vocab = collections.Counter()
    for t in texts:
        for w in _re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    vs = {w: tuple(w) + ("</w>",) for w in vocab}
    want = []
    for rank in range(12):
        pc = collections.Counter()
        for w, syms in vs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        (l, r), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if f <= 1:
            break
        want.append((rank, l, r, f))
        for w, syms in list(vs.items()):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vs[w] = tuple(out)
    assert got == want
    # the corpus actually exercised the overlap rule: chained
    # self-merges (a,a) then (aa,a) must both have been learned
    assert [m[1:3] for m in want[:2]] == [("a", "a"), ("aa", "a")]
