"""Statistical scalar functions: erf / Normal CDF (SURVEY.md §2.7).

The reference normalizes final scores with a Normal-CDF squash of log-scores
(LinkRankComputation.java:234-255, via commons-math 1.1
NormalDistributionImpl.cumulativeProbability). Spark has no erf builtin, so we
use the Abramowitz & Stegun 7.1.26 rational approximation (max abs error
1.5e-7, far inside the reference's own 1e-3 golden tolerance,
LinkRankComputationTest.java:40) as a pure Column expression — JVM-side,
codegen-friendly, no Python in the hot path.

Both a Column builder and a SQL-text builder are provided; the SQL text is
valid in Spark SQL *and* DuckDB so the oracle can evaluate the identical
formula. The two builders mirror each other operation-for-operation so double
results are bit-identical.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT2 = 1.4142135623730951  # math.sqrt(2)

# A&S 7.1.26 constants
_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = 1.453152027  # subtracted in the Horner chain
_A5 = 1.061405429


def erf(x: Column) -> Column:
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_P) * ax)
    poly = (
        (((F.lit(_A5) * t - F.lit(_A4)) * t + F.lit(_A3)) * t + F.lit(_A2)) * t + F.lit(_A1)
    ) * t
    sign = F.when(x >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return sign * (F.lit(1.0) - poly * F.exp(-(x * x)))


def erf_sql(x: str) -> str:
    """Same approximation as :func:`erf`, as engine-portable SQL text.

    ``x`` should be a simple column reference or parenthesized expression —
    it is substituted multiple times.
    """
    t = f"(1.0 / (1.0 + {_P} * abs({x})))"
    poly = f"(((({_A5} * {t} - {_A4}) * {t} + {_A3}) * {t} + {_A2}) * {t} + {_A1}) * {t}"
    return f"((CASE WHEN {x} >= 0 THEN 1.0 ELSE -1.0 END) * (1.0 - {poly} * exp(-(({x}) * ({x})))))"


def normal_cdf(x: Column, mu: Column | float, sigma: Column | float) -> Column:
    """P(X <= x) for X ~ N(mu, sigma^2)."""
    mu = F.lit(mu) if not isinstance(mu, Column) else mu
    sigma = F.lit(sigma) if not isinstance(sigma, Column) else sigma
    z = (x - mu) / (sigma * F.lit(SQRT2))
    return F.lit(0.5) * (F.lit(1.0) + erf(z))


def normal_cdf_sql(x: str, mu: str, sigma: str) -> str:
    z = f"((({x}) - ({mu})) / (({sigma}) * {SQRT2!r}))"
    return f"(0.5 * (1.0 + {erf_sql(z)}))"


def py_erf_approx(x: float) -> float:
    """Python mirror of the approximation (for tests / simulations)."""
    t = 1.0 / (1.0 + _P * abs(x))
    poly = ((((_A5 * t - _A4) * t + _A3) * t + _A2) * t + _A1) * t
    sign = 1.0 if x >= 0 else -1.0
    return sign * (1.0 - poly * math.exp(-(x * x)))
