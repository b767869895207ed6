"""Degenerate Fellegi-Sunter m/u parameters must fail loudly.

m or u at 0 or 1, or m == u, would otherwise embed ln(0) / a zero
denominator / a zero-information weight silently into the score
expression (ADVICE r11)."""

import pytest

from ent_fins_lakehouse_spark.operators.linkage import (
    field_weights,
    field_weights_sql,
)


@pytest.mark.parametrize(
    "m,u",
    [
        ((1, 1), (1, 4)),  # m == 1 -> ln(0) in disagreement weight
        ((0, 4), (1, 4)),  # m == 0
        ((3, 4), (1, 1)),  # u == 1 -> zero denominator
        ((3, 4), (0, 4)),  # u == 0 -> ln(inf)
        ((2, 4), (1, 2)),  # m == u after reduction: no information
        ((3, 0), (1, 4)),  # zero denominator outright
    ],
)
def test_degenerate_mu_rejected(m, u):
    # validation fires BEFORE any Column construction, so no session
    with pytest.raises(ValueError):
        field_weights(m, u)
    with pytest.raises(ValueError):
        field_weights_sql(m, u)


def test_valid_mu_accepted(spark):
    wa, wd = field_weights((9, 10), (1, 10))
    assert wa is not None and wd is not None
    sa, sd = field_weights_sql((9, 10), (1, 10))
    assert isinstance(sa, str) and isinstance(sd, str)
