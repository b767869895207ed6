"""Cross-engine-deterministic math kernels.

IEEE-754 double +, -, *, / are exactly specified (correctly rounded),
so any two engines evaluating the SAME expression tree over the same
doubles produce bit-identical results. Transcendental library calls
(``ln``, ``exp``) are NOT: JVM StrictMath/fdlibm and DuckDB's C++ libm
legitimately differ by 1 ulp, which flips ``ROUND(ln(x), 4)`` whenever
x lands within an ulp of a 4dp rounding boundary (the only hash
mismatches ever observed in the full-registry sf0.1 sweep — SCALING.md
r9s3c; VERDICT r9 item 1).

``det_ln_ratio(a, b)`` therefore computes ln(a/b) for integer
1 <= a <= b using ONLY exactly-specified operations, with the same
expression tree emitted for Spark (Column algebra) and DuckDB (SQL
text), so both engines return the bit-identical double:

1. Exact range reduction via integer arithmetic: the binary exponent
   comes from ``length(bin(n)) - 1`` (exact on both engines), and the
   mantissa ``m = (a << k) / b`` lands in [1, 2) with the shift-vs-b
   comparison done on exact integers. The single double division is
   correctly rounded, hence deterministic.
2. ln(m) for m in [1, 2) via the atanh series with z = (m-1)/(m+1)
   (z <= 1/3): a fixed 13-term Horner polynomial in w = z*z.
   Truncation error <= z^27/27 ~ 2.8e-14 — irrelevant for hash
   equality because BOTH engines compute the same truncated series.
3. ln(a/b) = ln(m) - k * LN2 with LN2 a shared decimal literal
   (literal parsing is correctly rounded on both engines).

The series coefficients are written as ``(1.0/3.0)``-style divisions
on both sides: constant folding performs one correctly-rounded IEEE
division per coefficient, identical everywhere.

Scale shape: pure map-side scalar expressions inside whole-stage
codegen — no shuffle, no UDF, no driver work. The integer shift
``a << k`` stays within BIGINT for any b < 2^62 (k <= ilog2(b) -
ilog2(a) + 1, so a << k < 2b).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Shortest decimal literal that parses to the double nearest ln(2),
#: identical on every IEEE-754 engine.
DET_LN2 = "0.6931471805599453"

#: Odd-reciprocal coefficients of the atanh series, emitted as literal
#: divisions so both engines fold them with one correctly-rounded op.
_SERIES_DENOMS = (3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25)


def _ilog2(col: Column) -> Column:
    """Exact floor(log2(n)) for positive BIGINT via the binary-string
    length — no floating point involved."""
    return (F.length(F.bin(col)) - F.lit(1)).cast("int")


def det_ln_ratio(a: Column, b: Column) -> Column:
    """ln(a/b) for integer columns 1 <= a <= b, bit-identical to the
    SQL emitted by :func:`det_ln_ratio_sql` on DuckDB."""
    a = a.cast("bigint")
    b = b.cast("bigint")
    k0 = _ilog2(b) - _ilog2(a)
    # a << k: exact integer shift (pyspark's F.shiftleft type-hints an
    # int literal, but the underlying SQL function takes any expression)
    num0 = F.call_function("shiftleft", a, k0)
    k = F.when(num0 < b, k0 + F.lit(1)).otherwise(k0)
    num = F.call_function("shiftleft", a, k)

    m = num.cast("double") / b.cast("double")
    z = (m - F.lit(1.0)) / (m + F.lit(1.0))
    w = z * z
    # Horner: 1 + w*(1/3 + w*(1/5 + ... + w*(1/25)))
    poly = F.lit(1.0) / F.lit(float(_SERIES_DENOMS[-1]))
    for d in reversed(_SERIES_DENOMS[:-1]):
        poly = (F.lit(1.0) / F.lit(float(d))) + w * poly
    poly = F.lit(1.0) + w * poly
    lnm = (F.lit(2.0) * z) * poly
    return lnm - k.cast("double") * F.lit(float(DET_LN2))


def det_ln_ratio_const(a: int, b: int) -> float:
    """Driver-side constant fold of :func:`det_ln_ratio` for INTEGER
    literals 1 <= a <= b: the identical IEEE-754 operation sequence in
    CPython (whose float ops are the same correctly-rounded doubles),
    so the result is bit-identical to what Catalyst's constant folding
    of the Column tree produces — and to the DuckDB twin. Exists
    because building the ~90-node Column tree costs ~175 ms of py4j
    round trips PER CALL on the driver (r14 profile of the linkage
    scorer: 6 calls = 1.05 s of driver wall); a known-constant ratio
    needs one literal instead (guide §1.2)."""
    if not (1 <= a <= b):
        raise ValueError(f"det_ln_ratio_const needs 1 <= a <= b, got {a}, {b}")
    k0 = (b.bit_length() - 1) - (a.bit_length() - 1)
    num0 = a << k0
    k = k0 + 1 if num0 < b else k0
    num = a << k
    # mirror cast(double)/cast(double): convert each side first
    m = float(num) / float(b)
    z = (m - 1.0) / (m + 1.0)
    w = z * z
    poly = 1.0 / float(_SERIES_DENOMS[-1])
    for d in reversed(_SERIES_DENOMS[:-1]):
        poly = (1.0 / float(d)) + w * poly
    poly = 1.0 + w * poly
    lnm = (2.0 * z) * poly
    return lnm - float(k) * float(DET_LN2)


def det_quantize4(x: Column) -> Column:
    """Quantize a (cross-engine bit-identical) double onto the 1e-4
    integer grid with round-half-away-from-zero.

    Scale-0 rounding of the SAME double is deterministic on both
    engines (Java HALF_UP on the shortest repr and C++ std::round both
    round half away from zero, and sub-half cases agree because the
    shortest repr round-trips). Scale-4 rounding is NOT: Spark rounds
    the decimal expansion exactly while DuckDB multiplies by 1e4 first,
    so doubles within an ulp of a x.xxxx5 boundary flip between
    engines — the actual source of the r9 sf0.1 hash mismatches."""
    return F.round(x * F.lit(10000.0), 0).cast("bigint")


def det_quantize4_sql(x: str) -> str:
    """DuckDB twin of :func:`det_quantize4`."""
    return f"CAST(round(({x}) * 10000.0) AS BIGINT)"


def det_mean4(sum4: Column, n: Column) -> Column:
    """Mean of an integer 1e-4-scaled sum, rounded half-away back onto
    the 1e-4 grid and returned as a double. The double division of two
    exact integers is correctly rounded (identical everywhere), and the
    final round is scale-0, so the result is bit-identical across
    engines — unlike ROUND(sum/n, 4), which ties exactly on the
    x.xxxx5 boundary whenever n divides the 4dp sum (e.g. a 10-token
    doc with sum -34.0085)."""
    avg4 = F.round(sum4.cast("double") / n.cast("double"), 0).cast("bigint")
    return avg4.cast("double") / F.lit(10000.0)


def det_mean4_sql(sum4: str, n: str) -> str:
    """DuckDB twin of :func:`det_mean4`."""
    return f"(CAST(round(CAST({sum4} AS DOUBLE) / CAST({n} AS DOUBLE)) AS BIGINT) / 10000.0)"


def det_ln_ratio_sql(a: str, b: str) -> str:
    """DuckDB SQL text computing the bit-identical ln(a/b); ``a`` and
    ``b`` are SQL sub-expressions yielding BIGINT with 1 <= a <= b.

    Emitted as a single scalar expression (correlated-CTE-free) so it
    drops into any SELECT list; sub-expressions are repeated, which
    DuckDB CSE-collapses.
    """
    ka = f"(length(bin(CAST({a} AS BIGINT)))-1)"
    kb = f"(length(bin(CAST({b} AS BIGINT)))-1)"
    k0 = f"({kb} - {ka})"
    num0 = f"(CAST({a} AS BIGINT) << {k0})"
    k = f"(CASE WHEN {num0} < CAST({b} AS BIGINT) THEN {k0}+1 ELSE {k0} END)"
    num = f"(CAST({a} AS BIGINT) << {k})"
    m = f"(CAST({num} AS DOUBLE) / CAST({b} AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    w = f"({z} * {z})"
    poly = f"(1.0/{float(_SERIES_DENOMS[-1])})"
    for d in reversed(_SERIES_DENOMS[:-1]):
        poly = f"((1.0/{float(d)}) + {w} * {poly})"
    poly = f"(1.0 + {w} * {poly})"
    lnm = f"((2.0 * {z}) * {poly})"
    return f"({lnm} - CAST({k} AS DOUBLE) * {DET_LN2})"


#: (2k+1)! denominators of the sin Taylor series, exact in double
#: (every factorial through 22! is exactly representable).
_SIN_DENOMS = (
    6,
    120,
    5040,
    362880,
    39916800,
    6227020800,
    1307674368000,
    355687428096000,
    121645100408832000,
    51090942171709440000,
)

#: (2k)! denominators of the cos Taylor series.
_COS_DENOMS = (
    2,
    24,
    720,
    40320,
    3628800,
    479001600,
    87178291200,
    20922789888000,
    6402373705728000,
    2432902008176640000,
)

#: asin series coefficients ((2k-1)!!/(2k)!!/(2k+1)) as exact integer
#: (numerator, denominator) pairs — emitted as one literal division
#: each, correctly rounded identically on both engines.
_ASIN_COEFS = (
    (1, 6),
    (3, 40),
    (15, 336),
    (105, 3456),
    (945, 42240),
    (10395, 599040),
    (135135, 9676800),
    (2027025, 175472640),
)

#: Shortest decimal literal parsing to the double nearest pi.
DET_PI = "3.141592653589793"


def _horner(w: Column, coefs: list[Column]) -> Column:
    poly = coefs[-1]
    for c in reversed(coefs[:-1]):
        poly = c + w * poly
    return poly


def _alt_coefs(denoms, first_negative: bool) -> list[Column]:
    """Alternating-sign reciprocal coefficients as IN-ENGINE literal
    divisions (one correctly rounded fold each — the det_ln_ratio
    device, identical on both engines)."""
    out = []
    for k, d in enumerate(denoms):
        neg = (k % 2 == 0) == first_negative
        out.append(F.lit(-1.0 if neg else 1.0) / F.lit(float(d)))
    return out


def det_sin(x: Column) -> Column:
    """sin(x) for |x| <= ~1.9 rad via the fixed 10-term Taylor Horner —
    bit-identical to :func:`det_sin_sql` on DuckDB (only exactly
    specified IEEE ops: the coefficients are single literal divisions,
    the Horner is the same tree on both engines). Truncation error at
    |x| = 1.9 is ~ x^23/23! < 1e-16 relative — but determinism does not
    depend on accuracy: both engines compute the SAME truncated
    series. Used by the geo family (latitudes/half-angle deltas are
    range-bounded by construction, so no range reduction is needed)."""
    w = x * x
    return x * (F.lit(1.0) + w * _horner(w, _alt_coefs(_SIN_DENOMS, True)))


def det_sin_sql(x: str) -> str:
    """DuckDB twin of :func:`det_sin`."""
    w = f"(({x}) * ({x}))"
    coefs = [
        f"({'-' if k % 2 == 0 else ''}1.0/{float(d)})" for k, d in enumerate(_SIN_DENOMS)
    ]
    poly = coefs[-1]
    for c in reversed(coefs[:-1]):
        poly = f"({c} + {w} * {poly})"
    return f"(({x}) * (1.0 + {w} * {poly}))"


def det_cos(x: Column) -> Column:
    """cos(x) for |x| <= ~1.9 rad — see :func:`det_sin` for the
    determinism argument; twin of :func:`det_cos_sql`."""
    w = x * x
    return F.lit(1.0) + w * _horner(w, _alt_coefs(_COS_DENOMS, True))


def det_cos_sql(x: str) -> str:
    """DuckDB twin of :func:`det_cos`."""
    w = f"(({x}) * ({x}))"
    coefs = [
        f"({'-' if k % 2 == 0 else ''}1.0/{float(d)})" for k, d in enumerate(_COS_DENOMS)
    ]
    poly = coefs[-1]
    for c in reversed(coefs[:-1]):
        poly = f"({c} + {w} * {poly})"
    return f"(1.0 + {w} * {poly})"


def det_asin(y: Column) -> Column:
    """Truncated asin series for y in [0, 1] — strictly MONOTONIC in y
    (all coefficients positive), so ordering by it equals ordering by
    the exact asin/haversine distance; bit-identical to
    :func:`det_asin_sql`. Accuracy is high only for small y (the
    nearest-neighbor regime a top-k query emits: relative truncation
    error < 1e-12 for y <= 0.35); for y -> 1 the value undershoots the
    true asin on BOTH engines equally, so ranking and hashes still
    agree everywhere."""
    v = y * y
    coefs = [F.lit(float(n)) / F.lit(float(d)) for n, d in _ASIN_COEFS]
    return y * (F.lit(1.0) + v * _horner(v, coefs))


def det_asin_sql(y: str) -> str:
    """DuckDB twin of :func:`det_asin`."""
    v = f"(({y}) * ({y}))"
    coefs = [f"({float(n)}/{float(d)})" for n, d in _ASIN_COEFS]
    poly = coefs[-1]
    for c in reversed(coefs[:-1]):
        poly = f"({c} + {v} * {poly})"
    return f"(({y}) * (1.0 + {v} * {poly}))"
