"""ClickHouse's parametric random-distribution generators
(``randPoisson`` / ``randBinomial`` / ``randNegativeBinomial`` /
``randChiSquared`` / ``randStudentT`` / ``randFisherF``) as
Arrow-batched pandas UDFs over ``numpy.random`` (SURVEY.md §2 B8 tail).

Spark's codegen randoms stop at ``rand()``/``randn()`` — enough for
randCanonical/randUniform/randNormal/randExponential/randLogNormal,
which the dialect emits as pure JVM transforms — but the discrete and
ratio distributions need sampler loops, which numpy's ``Generator``
vectorizes per Arrow batch.  This is per-row scalar work with no
shuffle and no state, so it distributes with the rows at any scale.

Every UDF is registered ``.asNondeterministic()`` (a fresh OS-entropy
``Generator`` per batch) so Catalyst never constant-folds or caches a
draw.  NULL parameters give NULL draws; invalid parameters (negative
rate, p outside [0, 1]) raise numpy's loud ValueError rather than
clamping — matching the repo's exact-or-loud stance.

Return types follow ClickHouse: the count distributions (poisson,
binomial, negative binomial) return UInt64 ≙ BIGINT; the continuous
ratios (chi-squared, Student t, Fisher F) return Float64 ≙ DOUBLE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType


def _draw_long(params: list[pd.Series], sampler) -> pd.Series:
    """Vectorized integer draw with NULL passthrough on any NULL
    parameter row."""
    cols = [pd.to_numeric(p, errors="coerce") for p in params]
    mask = np.logical_and.reduce([c.notna().to_numpy() for c in cols])
    out = pd.Series([pd.NA] * len(cols[0]), dtype="Int64")
    if mask.any():
        rng = np.random.default_rng()
        args = [c.to_numpy(dtype=float)[mask] for c in cols]
        out[mask] = sampler(rng, *args).astype("int64")
    return out


def _draw_double(params: list[pd.Series], sampler) -> pd.Series:
    cols = [pd.to_numeric(p, errors="coerce") for p in params]
    mask = np.logical_and.reduce([c.notna().to_numpy() for c in cols])
    out = pd.Series(np.full(len(cols[0]), np.nan))
    if mask.any():
        rng = np.random.default_rng()
        args = [c.to_numpy(dtype=float)[mask] for c in cols]
        out[mask] = sampler(rng, *args)
    return out.where(pd.Series(mask), None)


@pandas_udf(LongType())
def _udf_rand_poisson(lam: pd.Series) -> pd.Series:
    return _draw_long([lam], lambda rng, l: rng.poisson(l))


@pandas_udf(LongType())
def _udf_rand_binomial(n: pd.Series, p: pd.Series) -> pd.Series:
    return _draw_long(
        [n, p], lambda rng, nn, pp: rng.binomial(nn.astype("int64"), pp)
    )


@pandas_udf(LongType())
def _udf_rand_negative_binomial(n: pd.Series, p: pd.Series) -> pd.Series:
    return _draw_long(
        [n, p],
        lambda rng, nn, pp: rng.negative_binomial(nn.astype("int64"), pp),
    )


@pandas_udf(DoubleType())
def _udf_rand_chi_squared(k: pd.Series) -> pd.Series:
    return _draw_double([k], lambda rng, kk: rng.chisquare(kk))


@pandas_udf(DoubleType())
def _udf_rand_student_t(k: pd.Series) -> pd.Series:
    return _draw_double([k], lambda rng, kk: rng.standard_t(kk))


@pandas_udf(DoubleType())
def _udf_rand_fisher_f(d1: pd.Series, d2: pd.Series) -> pd.Series:
    return _draw_double([d1, d2], lambda rng, a, b: rng.f(a, b))


_REGISTRY = {
    "ch_rand_poisson": _udf_rand_poisson,
    "ch_rand_binomial": _udf_rand_binomial,
    "ch_rand_negative_binomial": _udf_rand_negative_binomial,
    "ch_rand_chi_squared": _udf_rand_chi_squared,
    "ch_rand_student_t": _udf_rand_student_t,
    "ch_rand_fisher_f": _udf_rand_fisher_f,
}


def register_randdist(spark: SparkSession) -> None:
    """Idempotently register the ``ch_rand_*`` SQL names so
    ``chsql.translate`` output resolves."""
    for name, udf in _REGISTRY.items():
        spark.udf.register(name, udf.asNondeterministic())
