"""Round-5 hunt wave P pins: read_csv pandas params (previously silently
ignored via **kwargs) and pandas-parity inferred schema."""
from __future__ import annotations

import pandas as pd
import pytest

import pandas_expr_spark as pes


@pytest.fixture()
def csv_path(tmp_path):
    p = str(tmp_path / "t.csv")
    pd.DataFrame({"a": [1, 2, 3, 4], "b": ["x", "y", "z", "w"],
                  "d": ["2024-01-01", "2024-02-01", "2024-03-01",
                        "2024-04-01"],
                  "f": [1.5, 2.5, None, 4.0]}).to_csv(p, index=False)
    return p


def test_read_csv_inferred_schema_matches_pandas(csv_path):
    want = pd.read_csv(csv_path)
    got = pes.read_csv(csv_path).compute()
    # int64 (not Spark's int32), date-looking text stays STRING
    assert got.dtypes.to_dict() == want.dtypes.to_dict()
    assert got["d"].tolist() == want["d"].tolist()


def test_read_csv_pandas_params(csv_path):
    want = pd.read_csv(csv_path, dtype={"a": "float64"})
    got = pes.read_csv(csv_path, dtype={"a": "float64"}).compute()
    assert got["a"].dtype == want["a"].dtype == "float64"

    got = pes.read_csv(csv_path, parse_dates=["d"]).compute()
    assert str(got["d"].dtype).startswith("datetime64")

    assert len(pes.read_csv(csv_path, nrows=2).compute()) == 2

    want = pd.read_csv(csv_path, skiprows=[1])
    got = pes.read_csv(csv_path, skiprows=[1]).compute()
    pd.testing.assert_frame_equal(
        got.sort_values("a").reset_index(drop=True),
        want.sort_values("a").reset_index(drop=True))

    want = pd.read_csv(csv_path, index_col="a")
    got = pes.read_csv(csv_path, index_col="a").compute().sort_index()
    pd.testing.assert_frame_equal(got, want)


def test_read_csv_unknown_kwargs_raise(csv_path):
    # silent acceptance hid wrong results (the old **kwargs swallowed
    # every pandas param); unknown args must raise
    with pytest.raises(NotImplementedError):
        pes.read_csv(csv_path, low_memory=False)
