#!/usr/bin/env python
"""The LLM-training-data arc, end to end, on this engine:

raw corpus → quality filter + language ID → PII redaction → exact
dedup → MinHash-LSH near-dedup → connected-component group pick →
token accounting + corpus mix report → embedding ANN neighbors —
the pre-training data pipeline the extension operators exist for
(SURVEY.md §2.12), as a plain Python program over the driver's
`documents`/`embeddings` tables.

Run: python examples/corpus_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ent_fins_lakehouse_spark import get_session  # noqa: E402
from ent_fins_lakehouse_spark.functions.text import (  # noqa: E402
    language_id,
    quality_metrics,
    token_count,
)
from ent_fins_lakehouse_spark.operators.dedup import (  # noqa: E402
    canonical_dedup,
    dedup_connected_components,
    minhash_lsh_pairs,
)
from ent_fins_lakehouse_spark.operators.similarity import cosine_topk  # noqa: E402
from ent_fins_lakehouse_spark.sources.readers import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="corpus-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality filter + language ID (JVM-side expressions)
    scored = language_id(quality_metrics(docs, "text"), "text")
    kept = scored.filter(
        (F.col("n_words") >= 5) & (F.col("punct_ratio") < 0.3)
    )
    n1 = kept.count()

    # 2. PII scrub (regexp_replace, no UDF)
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    kept = kept.withColumn("text", F.regexp_replace("text", email_re, "<EMAIL>"))

    # 3. exact dedup on normalized text
    exact = canonical_dedup(kept, ["text"], "doc_id")
    n2 = exact.count()

    # 4. near-dedup: banded MinHash LSH -> connected components ->
    #    keep each group's min doc_id
    pairs = minhash_lsh_pairs(kept, "doc_id", "text", jaccard_threshold=0.9, shingle_n=3)
    groups = dedup_connected_components(pairs, kept.select("doc_id"), "doc_id")
    reps = groups.groupBy("group_id").agg(F.min("doc_id").alias("doc_id"))
    final = kept.join(reps, "doc_id", "left_semi")
    n3 = final.count()

    # 5. token accounting + mix report
    mix = (
        final.withColumn("n_tokens", token_count("text"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy(F.desc("tokens"))
    )
    print(f"docs: raw={n0} quality={n1} exact-dedup={n2} near-dedup={n3}")
    mix.show(10, truncate=False)

    # 6. embedding neighbors: exact cosine top-k for one probe vector
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    nn = cosine_topk(emb, "embedding", list(qrow["embedding"]), k=4, id_col="vec_id")
    print(f"nearest neighbors of vec_id={qrow['vec_id']}:")
    nn.show(4, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
