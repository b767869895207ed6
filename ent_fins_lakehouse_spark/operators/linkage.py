"""Probabilistic record linkage (entity resolution).

The Fellegi-Sunter model (JASA 1969) — the standard for matching
records across two files without a shared key: candidate pairs from
BLOCKING (never a cross join — the same bounded-blocking discipline as
the dedup/LSH family), then each comparison field contributes a
log-likelihood-ratio weight

    agree:     ln(m_j / u_j)
    disagree:  ln((1 - m_j) / (1 - u_j))

where m_j = P(agree | match) and u_j = P(agree | non-match). The total
score ranks pairs; thresholds split match / possible / non-match.

Determinism: m/u are supplied as RATIONALS and every weight is
computed with :func:`functions.detmath.det_ln_ratio` over the reduced
integer ratio — constant-folded to the bit-identical double on Spark
and DuckDB, so the whole scorer is exact-oracle-checkable (scores are
sums of a fixed tree of folded constants selected by boolean
agreement columns).

Scale shape: blocking bounds the pair count (block key at 100 TB:
postcode/nation/LSH bucket); agreements and the score are pure
codegen column expressions; top-N by score is TakeOrderedAndProject.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import gcd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ent_fins_lakehouse_spark.functions.detmath import det_ln_ratio_const


@dataclass(frozen=True)
class FieldSpec:
    """One comparison field: an agreement predicate plus its m/u
    probabilities as rationals (num, den)."""

    name: str
    agree: Column
    m: tuple[int, int]
    u: tuple[int, int]


def _det_ln_rational(num: int, den: int) -> Column:
    """ln(num/den) for positive integers: the arguments are known
    Python ints, so the value is folded ON THE DRIVER via
    det_ln_ratio_const (bit-identical to the det_ln_ratio Column tree
    Catalyst would have constant-folded — r14: the tree cost ~175 ms
    of py4j expression-building per call) and emitted as one literal.
    det_ln_ratio needs a <= b: ln(a/b) directly, or -ln(b/a) when the
    ratio exceeds 1."""
    g = gcd(num, den)
    num, den = num // g, den // g
    if num <= den:
        return F.lit(det_ln_ratio_const(num, den))
    return F.lit(-det_ln_ratio_const(den, num))


def _det_ln_rational_sql(num: int, den: int) -> str:
    from ent_fins_lakehouse_spark.functions.detmath import det_ln_ratio_sql

    g = gcd(num, den)
    num, den = num // g, den // g
    if num <= den:
        return det_ln_ratio_sql(str(num), str(den))
    return f"(0.0 - {det_ln_ratio_sql(str(den), str(num))})"


def _validate_mu(
    m: tuple[int, int], u: tuple[int, int], name: str = "<field>"
) -> None:
    """Loudly reject degenerate m/u: either probability at 0 or 1, or
    m == u, yields ln(0), a zero denominator, or ln(1) fed into the
    score — a silent -inf/NaN instead of a configuration error."""
    mn, md = m
    un, ud = u
    if md <= 0 or ud <= 0:
        raise ValueError(f"field {name!r}: m/u denominators must be positive")
    if not (0 < mn < md):
        raise ValueError(f"field {name!r}: m={mn}/{md} must satisfy 0 < m < 1")
    if not (0 < un < ud):
        raise ValueError(f"field {name!r}: u={un}/{ud} must satisfy 0 < u < 1")
    if mn * ud == un * md:
        raise ValueError(f"field {name!r}: m == u carries no information")


def field_weights(
    m: tuple[int, int], u: tuple[int, int], name: str = "<field>"
) -> tuple[Column, Column]:
    """(agreement_weight, disagreement_weight) Columns for one field."""
    _validate_mu(m, u, name)
    mn, md = m
    un, ud = u
    agree = _det_ln_rational(mn * ud, md * un)  # ln((m)/(u))
    disagree = _det_ln_rational((md - mn) * ud, md * (ud - un))  # ln((1-m)/(1-u))
    return agree, disagree


def field_weights_sql(m: tuple[int, int], u: tuple[int, int]) -> tuple[str, str]:
    _validate_mu(m, u)
    mn, md = m
    un, ud = u
    return (
        _det_ln_rational_sql(mn * ud, md * un),
        _det_ln_rational_sql((md - mn) * ud, md * (ud - un)),
    )


def fellegi_sunter_score(fields: list[FieldSpec]) -> Column:
    """The summed log-likelihood-ratio score as one fixed-order
    expression tree (left fold over the field list — mirror the same
    order in any SQL twin)."""
    score = None
    for f in fields:
        wa, wd = field_weights(f.m, f.u, f.name)
        contrib = F.when(f.agree, wa).otherwise(wd)
        score = contrib if score is None else (score + contrib)
    return score


def linkage_candidates(
    a: DataFrame, b: DataFrame, block_on: list[str]
) -> DataFrame:
    """Blocked candidate pairs: equi-join on the block key(s) — the
    only shuffle; pair count is O(sum of block-size products), never
    |A|x|B|."""
    return a.join(b, on=block_on, how="inner")
