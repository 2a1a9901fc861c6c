"""Callables referenced by UDF-registry tests (module:function paths)."""

import pandas as pd


def add(a, b):
    return a + b


def scale_series(s: pd.Series) -> pd.Series:
    return s * 2.0
