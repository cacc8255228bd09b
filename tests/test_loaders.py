"""UCI regression loader semantics (reference model_neurlinr.py:6-35).

Raw UCI blobs aren't fetchable in this sandbox, so the loaders are pinned
against synthetic fixture files that reproduce each format's quirks.
"""

import numpy as np
import pytest

from betacores_tpu.data.loaders import load_uci_regression


def test_boston_csv_and_housing_data(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((12, 14))
    hdr = ",".join([f"f{i}" for i in range(13)] + ["MEDV"])
    np.savetxt(tmp_path / "boston.csv", data, delimiter=",", header=hdr,
               comments="")
    X, Y = load_uci_regression("boston", data_dir=str(tmp_path))
    assert X.shape == (12, 13) and Y.shape == (12, 1)
    np.testing.assert_allclose(Y[:, 0], data[:, -1])

    # whitespace housing.data variant, found only when the csv is absent
    (tmp_path / "boston.csv").unlink()
    np.savetxt(tmp_path / "housing.data", data, fmt="%.6f")
    X2, Y2 = load_uci_regression("boston", data_dir=str(tmp_path))
    np.testing.assert_allclose(X2, X, atol=1e-5)
    np.testing.assert_allclose(Y2, Y, atol=1e-5)


def test_news_drops_is_columns_first_row_and_minmax_scales(tmp_path):
    rng = np.random.default_rng(1)
    # columns: url, timedelta, a, b_is_flag, c, shares(target)
    vals = rng.uniform(1.0, 9.0, size=(6, 6))
    hdr = "url,timedelta,a,b_is_flag,c,shares"
    np.savetxt(tmp_path / "news.csv", vals, delimiter=",", header=hdr,
               comments="")
    X, Y = load_uci_regression("news", data_dir=str(tmp_path))
    # '_is_' column dropped, first DATA row dropped, then url+timedelta cols
    # dropped -> features are (a, c) of rows 1:; target = shares of rows 1:
    assert X.shape == (5, 2) and Y.shape == (5, 1)
    np.testing.assert_allclose(Y[:, 0], vals[1:, -1])  # ref drops first data row
    # min-max scaled per column
    assert np.allclose(X.min(axis=0), 0.0) and np.allclose(X.max(axis=0), 1.0)
    a = vals[1:, 2]
    np.testing.assert_allclose(X[:, 0], (a - a.min()) / (a.max() - a.min()))


def test_year_and_prices2018_last_column_target(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.standard_normal((7, 4))
    np.savetxt(tmp_path / "year.txt", data, delimiter=",")
    X, Y = load_uci_regression("year", data_dir=str(tmp_path))
    np.testing.assert_allclose(X, data[:, :-1], atol=1e-5)
    np.testing.assert_allclose(Y, data[:, -1:], atol=1e-5)

    np.save(tmp_path / "prices2018.npy", data)
    X, Y = load_uci_regression("prices2018", data_dir=str(tmp_path))
    np.testing.assert_allclose(X, data[:, :-1])


def test_missing_file_error_and_unknown_name(tmp_path):
    with pytest.raises(FileNotFoundError, match="boston"):
        load_uci_regression("boston", data_dir=str(tmp_path))
    with pytest.raises(ValueError, match="Unsupported"):
        load_uci_regression("mnist", data_dir=str(tmp_path))


def test_load_npz_tiny_dataset_split_guard(tmp_path):
    """Regression (round-3 review): int(ttr*N)==0 made X[:-0] an empty train
    set; the split must keep >= 1 train and >= 1 test row or refuse."""
    from betacores_tpu.data.loaders import load_npz

    rng = np.random.default_rng(0)
    np.savez(tmp_path / "tiny.npz", X=rng.normal(size=(4, 2)),
             y=rng.integers(0, 2, size=4))
    X, Y, Xt, Yt = load_npz(str(tmp_path / "tiny.npz"), ttr=0.2)
    assert X.shape[0] == 3 and Xt.shape[0] == 1
    assert set(np.unique(Y)) <= {-1.0, 1.0}

    np.savez(tmp_path / "one.npz", X=rng.normal(size=(1, 2)), y=np.ones(1))
    with pytest.raises(ValueError, match="training row"):
        load_npz(str(tmp_path / "one.npz"), ttr=0.2)
