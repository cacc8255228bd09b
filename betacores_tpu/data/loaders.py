"""Dataset loading and preprocessing.

Specs: reference examples/common/model_lr.py:6-30 (npz loading with
train/test split and covariate whitening) and
examples/common/model_neurlinr.py:37-48 (standardization). The npz format is
the reference's: arrays ``X``, ``y`` and optional ``Xt``, ``yt``; labels in
{-1, +1} (or {0, 1}, remapped).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import numpy as np


def load_npz(path: str, ttr: float = 0.2):
    """Load an (X, y[, Xt, yt]) npz; split train/test by ``ttr`` if no test
    arrays are present (reference model_lr.py:6-18)."""
    data = np.load(path, allow_pickle=True)
    X = np.asarray(data["X"], dtype=np.float64)
    Y = np.asarray(data["y"], dtype=np.float64).reshape(-1)
    has_test = (
        "Xt" in data and "yt" in data
        and np.asarray(data["Xt"]).size > 1 and np.asarray(data["yt"]).size > 1
    )
    if has_test:
        Xt, Yt = np.asarray(data["Xt"], dtype=np.float64), np.asarray(data["yt"], dtype=np.float64).reshape(-1)
    else:
        # max(1, ...): int(ttr*N) == 0 would make X[:-0] an EMPTY train set
        # and hand every row to test (reference model_lr.py has the same
        # flaw; fixed, not reproduced — round-3 review)
        n_test = max(1, int(ttr * X.shape[0]))
        n_train = X.shape[0] - n_test
        if n_train < 1:
            raise ValueError(
                f"load_npz: {X.shape[0]} rows cannot satisfy a {ttr} test "
                f"split with at least one training row")
        X, Y, Xt, Yt = X[:n_train], Y[:n_train], X[n_train:], Y[n_train:]
    # remap {0,1} labels to {-1,+1}
    if set(np.unique(Y)) <= {0.0, 1.0}:
        Y = 2.0 * Y - 1.0
        Yt = 2.0 * Yt - 1.0
    return X, Y, Xt, Yt


def std_cov(X: np.ndarray, Y: np.ndarray, mean_: Optional[np.ndarray] = None,
            cov_: Optional[np.ndarray] = None):
    """Whiten the covariates by the Cholesky factor of their covariance; the
    last column (intercept) is untouched (reference model_lr.py:20-30).
    Returns (X, Y, Z=y*X, mean, cov) — pass (mean, cov) back in to transform
    test data consistently."""
    X = np.array(X, copy=True)
    if mean_ is None:
        mean_ = X[:, :-1].mean(axis=0)
        cov_ = np.cov(X[:, :-1], rowvar=False) + 1e-12 * np.eye(X.shape[1] - 1)
    L = np.linalg.cholesky(np.atleast_2d(cov_))
    X[:, :-1] = np.linalg.solve(L, (X[:, :-1] - mean_).T).T
    Z = Y[:, None] * X
    return X, Y, Z, mean_, cov_


def standardize(Xtrain, ytrain, *others):
    """Zero-mean unit-variance standardization fit on train, applied to any
    number of additional (X, y) pairs (reference model_neurlinr.py:37-48).
    Returns standardized arrays + (in_mean, in_std, out_mean, out_std)."""
    in_mean, in_std = Xtrain.mean(axis=0), Xtrain.std(axis=0)
    in_std = np.where(np.isclose(in_std, 0.0), 1.0, in_std)
    out_mean, out_std = ytrain.mean(axis=0), ytrain.std(axis=0)
    out_std = np.where(np.isclose(out_std, 0.0), 1.0, out_std)
    out = [(Xtrain - in_mean) / in_std, (ytrain - out_mean) / out_std]
    for i in range(0, len(others), 2):
        out.append((others[i] - in_mean) / in_std)
        out.append((others[i + 1] - out_mean) / out_std)
    return (*out, in_mean, in_std, out_mean, out_std)


def add_intercept(X: np.ndarray) -> np.ndarray:
    return np.hstack([X, np.ones((X.shape[0], 1), dtype=X.dtype)])


def load_groups_pickle(path: str) -> Tuple[List[List[int]], list]:
    """Load a demographic-groups pickle ``(groups, demos)`` as produced by
    the preprocessing scripts (reference preproc_adult.py:20-31)."""
    with open(path, "rb") as f:
        groups, demos = pickle.load(f)
    return [list(map(int, g)) for g in groups], demos


def make_random_groups(rng: np.random.Generator, N: int, group_size: int) -> List[List[int]]:
    """Contiguous random partition into groups of ~group_size (the
    neural-linear experiment batches points into groups of 20, reference
    zellner_neural_linear/main.py:86)."""
    perm = rng.permutation(N)
    return [perm[i : i + group_size].tolist() for i in range(0, N, group_size)]


def _data_roots():
    """Search order: $BETACORES_DATA, the repo-local ``data/`` output dir of
    examples/preprocess.py, then the read-only reference mirror."""
    repo_data = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data")
    return (os.environ.get("BETACORES_DATA", ""), repo_data,
            "/root/reference/examples/data")


def reference_dataset_path(name: str) -> Optional[str]:
    """Resolve a packaged dataset (preprocessed local artifacts take
    precedence over the read-only reference mirror)."""
    for root in _data_roots():
        if root:
            p = os.path.join(root, f"{name}.npz")
            if os.path.exists(p):
                return p
    return None


def groups_pickle_path(dataset: str, dataset_path: Optional[str] = None) -> Optional[str]:
    """Resolve a ``vq_groups_sensemake_<dataset>.pk`` group artifact
    (reference preproc_adult.py:20-48 format).

    When ``dataset_path`` (the resolved npz) is given, ONLY its own
    directory is searched: group indices encode that preprocessing run's
    row ordering, and a pickle from a different root would silently index
    the wrong rows of a re-preprocessed npz."""
    if dataset_path is not None:
        p = os.path.join(os.path.dirname(dataset_path),
                         f"vq_groups_sensemake_{dataset}.pk")
        return p if os.path.exists(p) else None
    for root in _data_roots():
        if root:
            p = os.path.join(root, f"vq_groups_sensemake_{dataset}.pk")
            if os.path.exists(p):
                return p
    return None

def load_uci_regression(name: str, data_dir: Optional[str] = None):
    """The reference neural-linear experiment's UCI regression loaders
    (spec: reference examples/common/model_neurlinr.py:6-35), pandas/sklearn
    free and gated on LOCAL files (this sandbox has zero egress; boston was
    also removed from sklearn >= 1.2). Returns ``(X, Y)`` with ``Y`` of
    shape (N, 1).

    - ``boston``:  ``boston.csv`` (header row, MEDV target last) or the
      classic whitespace ``housing.data`` (506 x 14, target last).
    - ``news``:    ``news.csv`` — drop every column whose name contains
      ``_is_``, drop the first data row and first two remaining columns
      (url, timedelta), min-max scale features; target = last column.
    - ``year``:    ``year.txt`` comma-delimited; X = all but last column,
      Y = last (the reference applies this split regardless of the
      file's column convention; behavior matched verbatim).
    - ``prices2018``: ``prices2018.npy`` (built by
      ``examples/preprocess.py housing``); same last-column-target split.

    Searches ``data_dir`` if given, else the standard roots
    (``$BETACORES_DATA``, repo ``data/``, reference mirror)."""
    import numpy as _np

    roots = [data_dir] if data_dir else [r for r in _data_roots() if r]

    def _find(*fnames):
        for root in roots:
            for fn in fnames:
                p = os.path.join(root, fn)
                if os.path.exists(p):
                    return p
        raise FileNotFoundError(
            f"{name}: none of {fnames} found under {roots} — raw UCI blobs "
            f"are not fetchable in this sandbox; drop the file into "
            f"$BETACORES_DATA or data/ to enable this dataset")

    if name == "boston":
        p = _find("boston.csv", "housing.data")
        data = (_np.genfromtxt(p, delimiter=",", skip_header=1)
                if p.endswith(".csv") else _np.genfromtxt(p))
    elif name == "news":
        p = _find("news.csv", "OnlineNewsPopularity.csv")
        with open(p) as f:
            header = [c.strip() for c in f.readline().split(",")]
        keep = [i for i, c in enumerate(header) if "_is_" not in c]
        data = _np.genfromtxt(p, delimiter=",", skip_header=1)[:, keep]
        data = data[1:, 2:]  # reference drops the first data row + url/timedelta
        X, Y = data[:, :-1], data[:, -1:]
        lo, hi = X.min(axis=0), X.max(axis=0)
        span = _np.where(_np.isclose(hi - lo, 0.0), 1.0, hi - lo)
        return (X - lo) / span, Y
    elif name == "year":
        data = _np.genfromtxt(_find("year.txt", "YearPredictionMSD.txt"),
                              delimiter=",")
    elif name == "prices2018":
        data = _np.load(_find("prices2018.npy"))
    else:
        raise ValueError(f"Unsupported UCI regression dataset: {name!r}")
    return data[:, :-1], data[:, -1:]
