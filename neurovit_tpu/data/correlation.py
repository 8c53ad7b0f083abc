"""Behavioral-CSV correlation analysis.

Re-implements ``src/data/correlation.py``: Pearson correlation + p-value
matrices over the numeric columns of a behavioral CSV, exported to Excel (or
CSV fallback) and a seaborn heatmap (correlation.py:9-54). Packaged as a
callable + module main instead of module-level script code.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import pandas as pd
from scipy import stats


def correlation_matrices(df: pd.DataFrame
                         ) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """(pearson_r, p_values) over numeric columns, pairwise-complete."""
    num = df.select_dtypes(include=[np.number])
    cols = num.columns
    r = pd.DataFrame(np.eye(len(cols)), index=cols, columns=cols)
    p = pd.DataFrame(np.zeros((len(cols), len(cols))), index=cols, columns=cols)
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if j <= i:
                continue
            pair = num[[a, b]].dropna()
            if len(pair) < 3:
                rv, pv = np.nan, np.nan
            else:
                rv, pv = stats.pearsonr(pair[a], pair[b])
            r.loc[a, b] = r.loc[b, a] = rv
            p.loc[a, b] = p.loc[b, a] = pv
    return r, p


def analyze(csv_path: str, output_dir: str = "./results",
            heatmap: bool = True) -> Tuple[pd.DataFrame, pd.DataFrame]:
    df = pd.read_csv(csv_path)
    r, p = correlation_matrices(df)
    os.makedirs(output_dir, exist_ok=True)
    base = os.path.join(
        output_dir, os.path.splitext(os.path.basename(csv_path))[0])
    try:
        with pd.ExcelWriter(base + "_correlation.xlsx") as xl:
            r.to_excel(xl, sheet_name="pearson_r")
            p.to_excel(xl, sheet_name="p_values")
    except (ImportError, ValueError):
        r.to_csv(base + "_correlation_r.csv")
        p.to_csv(base + "_correlation_p.csv")
    if heatmap:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
        plt.figure(figsize=(10, 8))
        sns.heatmap(r, annot=True, fmt=".2f", cmap="coolwarm",
                    vmin=-1, vmax=1)
        plt.tight_layout()
        plt.savefig(base + "_correlation_heatmap.png", dpi=150)
        plt.close()
    return r, p


if __name__ == "__main__":
    import sys
    analyze(sys.argv[1] if len(sys.argv) > 1 else
            "./src/data/paths_dataset_pain.csv")
