"""Behavioral-CSV correlation analysis (src/data/correlation.py analog)."""

import numpy as np
import pandas as pd
from scipy import stats

from neurovit_tpu.data.correlation import analyze, correlation_matrices


def _df(n=40, seed=0):
    rng = np.random.RandomState(seed)
    age = rng.uniform(50, 90, n)
    score = 0.8 * age + rng.randn(n) * 5          # strongly correlated
    noise = rng.randn(n)                          # uncorrelated
    return pd.DataFrame({"Subject": [f"S{i}" for i in range(n)],
                         "Age": age, "Score": score, "Noise": noise})


def test_correlation_matrices_match_scipy():
    df = _df()
    r, p = correlation_matrices(df)
    # Non-numeric columns excluded; diagonal r=1, p=0.
    assert list(r.columns) == ["Age", "Score", "Noise"]
    assert float(r.loc["Age", "Age"]) == 1.0 and float(p.loc["Age", "Age"]) == 0.0
    rv, pv = stats.pearsonr(df["Age"], df["Score"])
    assert float(r.loc["Age", "Score"]) == float(r.loc["Score", "Age"])
    np.testing.assert_allclose(float(r.loc["Age", "Score"]), rv, atol=1e-12)
    np.testing.assert_allclose(float(p.loc["Score", "Age"]), pv, atol=1e-12)
    assert float(p.loc["Age", "Score"]) < 1e-6      # strong pair significant
    assert float(p.loc["Age", "Noise"]) > 1e-6      # noise pair not


def test_correlation_matrices_pairwise_complete_and_short():
    df = _df(10)
    df.loc[3, "Score"] = np.nan                     # pairwise-complete drop
    r, _ = correlation_matrices(df)
    pair = df[["Age", "Score"]].dropna()
    rv, _ = stats.pearsonr(pair["Age"], pair["Score"])
    np.testing.assert_allclose(float(r.loc["Age", "Score"]), rv, atol=1e-12)
    # <3 complete rows -> NaN instead of a crash.
    tiny = pd.DataFrame({"a": [1.0, 2.0, np.nan], "b": [np.nan, 1.0, 2.0]})
    r2, p2 = correlation_matrices(tiny)
    assert np.isnan(float(r2.loc["a", "b"])) and np.isnan(float(p2.loc["a", "b"]))


def test_analyze_writes_outputs(tmp_path):
    csv = str(tmp_path / "behavior.csv")
    _df().to_csv(csv, index=False)
    r, p = analyze(csv, output_dir=str(tmp_path / "out"), heatmap=True)
    assert r.shape == (3, 3) and p.shape == (3, 3)
    outs = {f.name for f in (tmp_path / "out").iterdir()}
    assert "behavior_correlation_heatmap.png" in outs
    assert ("behavior_correlation.xlsx" in outs
            or "behavior_correlation_r.csv" in outs)
