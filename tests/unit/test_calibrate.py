"""Isotonic calibration (PAVA) tests: crafted violator pooling."""

from __future__ import annotations

import pytest

from tmdb_spark_data_pipeline_spark.operators import calibrate


def test_pava_pools_violators_exactly(spark):
    # rates by bin: 0.5, 0.2, 0.8 -> bins 1,2 violate (0.5 > 0.2): pooled
    # to (1+1)/(2+5)=2/7; 2/7 < 0.8 so bin 3 stands alone
    df = spark.createDataFrame(
        [("g", 1, 2, 1), ("g", 2, 5, 1), ("g", 3, 5, 4)],
        ["grp", "bin", "n", "h"],
    )
    out = {r.bin: r for r in calibrate.isotonic_fit(df, "grp", "bin", "h", "n").collect()}
    assert out[1].y_fit == out[2].y_fit == pytest.approx(2 / 7)
    assert out[3].y_fit == pytest.approx(4 / 5)
    assert out[1].y_raw == pytest.approx(1 / 2)
    # monotone, and pooling preserved totals
    assert out[1].y_fit <= out[3].y_fit


def test_pava_cascading_merge_and_already_monotone(spark):
    # 0.9, 0.5, 0.1 cascades into ONE block: (9+5+1)/(10+10+10)=0.5
    rows = [("c", i + 1, 10, h) for i, h in enumerate((9, 5, 1))]
    # a second, already-monotone group must pass through untouched
    rows += [("m", 1, 10, 1), ("m", 2, 10, 5), ("m", 3, 10, 9)]
    df = spark.createDataFrame(rows, ["grp", "bin", "n", "h"])
    out = calibrate.isotonic_fit(df, "grp", "bin", "h", "n").collect()
    c = {r.bin: r.y_fit for r in out if r.grp == "c"}
    m = {r.bin: r.y_fit for r in out if r.grp == "m"}
    assert all(v == pytest.approx(0.5) for v in c.values())
    assert m == {1: pytest.approx(0.1), 2: pytest.approx(0.5), 3: pytest.approx(0.9)}


def test_pava_equal_rates_not_merged_but_equal_fit(spark):
    # equal adjacent rates are not violations; fits equal raw rates
    df = spark.createDataFrame(
        [("g", 1, 4, 1), ("g", 2, 8, 2)], ["grp", "bin", "n", "h"]
    )
    out = {r.bin: r for r in calibrate.isotonic_fit(df, "grp", "bin", "h", "n").collect()}
    assert out[1].y_fit == out[2].y_fit == pytest.approx(0.25)


def test_ridge_fit_matches_numpy_closed_form(spark):
    import numpy as np

    from tmdb_spark_data_pipeline_spark.operators import calibrate

    rng = np.random.default_rng(7)
    x1 = rng.integers(0, 24, 200).astype(float)
    x2 = rng.integers(1, 8, 200).astype(float)
    y = 3.0 + 0.5 * x1 - 1.25 * x2 + rng.normal(0, 0.1, 200)
    rows = [("g", float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    got = calibrate.ridge_fit_2(df, ("g",), "y", "x1", "x2", lam=1.0).collect()[0]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    A = X.T @ X + np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y)
    assert abs(got.b0 - beta[0]) < 1e-6
    assert abs(got.b1 - beta[1]) < 1e-6
    assert abs(got.b2 - beta[2]) < 1e-6


def test_ridge_fit_degenerate_group_is_finite(spark):
    import math

    from tmdb_spark_data_pipeline_spark.operators import calibrate

    # constant predictors: OLS would be singular; ridge must stay finite
    df = spark.createDataFrame(
        [("g", 1.0, 2.0, float(v)) for v in (5, 7, 9)],
        "g string, x1 double, x2 double, y double",
    )
    got = calibrate.ridge_fit_2(df, ("g",), "y", "x1", "x2", lam=1.0).collect()[0]
    assert all(math.isfinite(v) for v in (got.b0, got.b1, got.b2))


def test_quantile_normalize_maps_groups_onto_global(spark):
    from tmdb_spark_data_pipeline_spark.operators import calibrate

    # Group A runs cold (0.1-0.3), group B hot (0.7-0.9); after
    # normalization each group's values are drawn from the GLOBAL sorted
    # values at its own quantile positions.
    rows = [("a", 1, 0.1), ("a", 2, 0.2), ("a", 3, 0.3),
            ("b", 4, 0.7), ("b", 5, 0.8), ("b", 6, 0.9)]
    df = spark.createDataFrame(rows, "src string, id int, v double")
    out = {r.id: r.normalized
           for r in calibrate.quantile_normalize(df, "v", "src", "id").collect()}
    # global sorted: [.1,.2,.3,.7,.8,.9] (N=6); each group has n=3, so
    # within-group ranks 1,2,3 map to global positions ceil(i*6/3) = 2,4,6
    assert out == {1: 0.2, 2: 0.7, 3: 0.9, 4: 0.2, 5: 0.7, 6: 0.9}


def test_quantile_normalize_identity_on_single_group(spark):
    from tmdb_spark_data_pipeline_spark.operators import calibrate

    df = spark.createDataFrame(
        [("x", i, float(i)) for i in range(1, 8)], "src string, id int, v double"
    )
    out = calibrate.quantile_normalize(df, "v", "src", "id").collect()
    # one group == the global distribution: normalization is the identity
    assert all(r.normalized == r.v for r in out)
