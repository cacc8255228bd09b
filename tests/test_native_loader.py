"""Native C++ loader tests: build, parse CSV + svmlight, agree with numpy."""

import os

import numpy as np
import pytest

from betacores_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def built():
    ok = nl.native_available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def test_csv_roundtrip(tmp_path, built, rng):
    data = rng.normal(size=(500, 7)).astype(np.float32)
    path = os.path.join(tmp_path, "t.csv")
    np.savetxt(path, data, delimiter=",", header="a,b,c,d,e,f,g", comments="")
    got = nl.load_csv(path, skip_header=1)
    assert got.shape == data.shape
    np.testing.assert_allclose(got, data, rtol=1e-5, atol=1e-6)


def test_csv_scientific_notation(tmp_path, built):
    path = os.path.join(tmp_path, "s.csv")
    with open(path, "w") as f:
        f.write("1e-3,2.5E+2,-inf\n-1.25e4,0.0,nan\n")
    got = nl.load_csv(path)
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got[0, :2], [1e-3, 250.0], rtol=1e-6)
    assert np.isneginf(got[0, 2]) and np.isnan(got[1, 2])
    np.testing.assert_allclose(got[1, 0], -12500.0, rtol=1e-6)


def test_svmlight(tmp_path, built):
    path = os.path.join(tmp_path, "t.svm")
    with open(path, "w") as f:
        f.write("+1 1:0.5 3:2.0\n")
        f.write("-1 2:-1.5\n")
        f.write("1 1:1.0 2:1.0 3:1.0 # comment\n")
    X, y = nl.load_svmlight(path)
    np.testing.assert_allclose(y, [1.0, -1.0, 1.0])
    want = np.array([[0.5, 0.0, 2.0], [0.0, -1.5, 0.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    np.testing.assert_allclose(X, want)
    # agrees with the pure-python fallback
    X2, y2 = nl._svmlight_numpy(path)
    np.testing.assert_allclose(X, X2)
    np.testing.assert_allclose(y, y2)


def test_multithreaded_equals_single(tmp_path, built, rng):
    data = rng.normal(size=(4000, 5)).astype(np.float32)
    path = os.path.join(tmp_path, "big.csv")
    np.savetxt(path, data, delimiter=",")
    a = nl.load_csv(path, n_threads=1)
    b = nl.load_csv(path, n_threads=8)
    np.testing.assert_allclose(a, b)
    assert a.shape == data.shape


def test_svmlight_qid_and_bad_index(tmp_path):
    from betacores_tpu.data.native_loader import _svmlight_numpy, load_svmlight

    f = tmp_path / "q.svm"
    f.write_text("1 qid:3 1:2.5 4:1.0\n-1 2:0.5\n")
    # native path (recompiled): qid token skipped, no hang
    X, y = load_svmlight(str(f), n_features=4)
    np.testing.assert_allclose(X[0], [2.5, 0, 0, 1.0])
    np.testing.assert_allclose(y, [1.0, -1.0])
    # numpy fallback: same semantics
    Xn, yn = _svmlight_numpy(str(f), n_features=4)
    np.testing.assert_allclose(Xn, X)
    # 0-based index is an error, not silent corruption of the last column
    f2 = tmp_path / "z.svm"
    f2.write_text("1 0:3.5 4:1.0\n")
    with pytest.raises(ValueError):
        _svmlight_numpy(str(f2), n_features=4)


def test_csv_single_row_fallback_is_2d(tmp_path, monkeypatch):
    import betacores_tpu.data.native_loader as nl

    f = tmp_path / "one.csv"
    f.write_text("1.0,2.0,3.0\n")
    monkeypatch.setattr(nl, "_get_lib", lambda: None)
    X = nl.load_csv(str(f))
    assert X.shape == (1, 3)


def test_csv_ragged_chunk_start_and_tab_delim(tmp_path, built):
    """Regression (round-3 review): (a) a ragged line must drop only ITSELF
    — per-chunk width latching could silently discard a whole thread-chunk
    (or poison the result width when the ragged line led chunk 0); (b) a
    tab must not be skipped as whitespace when it IS the delimiter (empty
    fields collapsed and the row was dropped as ragged)."""
    rows = ["%d,%d,%d" % (i, i + 1, i + 2) for i in range(2000)]
    rows[777] = "5,6"  # ragged: must drop exactly this one row
    path = os.path.join(tmp_path, "ragged.csv")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")
    X = nl.load_csv(path, n_threads=4)
    assert X.shape == (1999, 3)
    assert not (X[:, 0] == 777).any()
    assert (X[:, 0] == 776).any() and (X[:, 0] == 778).any()

    path = os.path.join(tmp_path, "tabs.tsv")
    with open(path, "w") as f:
        f.write("1\t\t2\n3\t4\t5\n")
    Y = nl.load_csv(path, delimiter="\t")
    assert Y.shape == (2, 3)
    np.testing.assert_allclose(Y[0], [1.0, 0.0, 2.0])
    np.testing.assert_allclose(Y[1], [3.0, 4.0, 5.0])
