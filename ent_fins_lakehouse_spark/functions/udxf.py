"""User-defined table/aggregate function surface (SURVEY.md §2.10).

The reference contains no UDTF/UDAF (its one row-level map is the RDD
escape hatch we replaced with ``vector_to_array``); this module rounds
out the sanctioned extension surface:

- :func:`sentence_udtf` — a Spark 4 Python UDTF (`@udtf`): one text row
  in, one row per sentence out — lateral-join table semantics
  (`SELECT ... FROM docs, LATERAL split_sentences(text)`).
- :func:`weighted_mean_udaf` — a grouped-aggregate Pandas UDF
  (`GROUPED_AGG`): vectorized per-group reduction, usable in
  ``groupBy().agg()`` and as a window aggregate.

Both are Arrow-batched; neither touches the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def sentence_udtf():
    """Build the sentence-splitting UDTF class (`python_udtf`).

    Splitting rule (kept trivially SQL-mirrorable for the oracle):
    split on ". ", emit (sentence_idx, sentence) for non-empty parts.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx INT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            for i, part in enumerate(text.split(". ")):
                if part:
                    yield i, part

    return SplitSentences


def weighted_mean_udaf():
    """Grouped-agg Pandas UDF: sum(v*w)/sum(w) per group, computed on
    numpy arrays per Arrow batch group."""
    # explicit GROUPED_AGG functionType: `from __future__ import
    # annotations` stringifies type hints, which breaks pyspark's
    # signature-based eval-type inference
    @F.pandas_udf("double", F.PandasUDFType.GROUPED_AGG)
    def weighted_mean(v, w):
        import numpy as np

        wv = np.asarray(w, dtype="float64")
        xv = np.asarray(v, dtype="float64")
        tot = wv.sum()
        return float((xv * wv).sum() / tot) if tot else float("nan")

    return weighted_mean
