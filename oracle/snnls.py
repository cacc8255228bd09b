"""Oracle sparse-NNLS solvers (NumPy float64).

Independent eager implementations of the greedy geometric solvers, with the
monotone-error / stabilize-retry / latch contract from reference
snnls/snnls.py:31-79. Specs cited per class in betacores_tpu/snnls/*.
"""

from __future__ import annotations

import numpy as np

from .opt import nnls_lawson_hanson

TOL = 1e-12


class OracleSNNLS:
    """min ||A w - b||, w >= 0, grown greedily one column per iteration."""

    check_error_monotone = True

    def __init__(self, A, b):
        self.A = np.asarray(A, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.w = np.zeros(A.shape[1])
        self.reached_numeric_limit = False

    def reset(self):
        self.w = np.zeros(self.A.shape[1])
        self.reached_numeric_limit = False

    def size(self):
        return int((self.w > 0).sum())

    def weights(self):
        return self.w.copy()

    def error(self):
        return float(np.sqrt(np.sum((self.A @ self.w - self.b) ** 2)))

    def build(self, itrs):
        if self.reached_numeric_limit or self.A.size == 0:
            return
        retried = False
        for _ in range(itrs):
            had_support = self.size() > 0
            prev_error = self.error()
            prev_w = self.w.copy()
            ok = True
            try:
                f = self._select()
                self._reweight(f)
            except FloatingPointError:
                ok = False
            if ok and self.check_error_monotone and had_support and self.error() > prev_error:
                self.w = prev_w
                ok = False
            if ok:
                retried = False
            else:
                self.w = prev_w
                if retried:
                    self.reached_numeric_limit = True
                    break
                retried = True
                self._stabilize()

    def optimize(self):
        prev_cost = self.error()
        prev_w = self.w.copy()
        nz = self.w > 0
        res = nnls_lawson_hanson(self.A[:, nz], self.b)
        self.w[nz] = res
        if self.error() > prev_cost * (1.0 + TOL):
            self.w = prev_w
            self.reached_numeric_limit = True

    def _stabilize(self):
        pass

    def _select(self):
        raise NotImplementedError

    def _reweight(self, f):
        raise NotImplementedError


class OracleGIGA(OracleSNNLS):
    """Greedy Iterative Geodesic Ascent (spec: reference snnls/giga.py)."""

    def __init__(self, A, b):
        super().__init__(A, b)
        norms = np.sqrt((self.A**2).sum(axis=0))
        if np.any(norms == 0):
            raise ValueError("A must not have zero columns")
        self.An = self.A / norms
        self.bnorm = np.sqrt((self.b**2).sum())
        if self.bnorm == 0.0:
            raise FloatingPointError("norm of b must be > 0")
        self.bn = self.b / self.bnorm

    def _select(self):
        xw = self.A @ self.w
        nw = np.sqrt((xw**2).sum())
        xw = xw / (1.0 if nw == 0.0 else nw)
        cdir = self.bn - (self.bn @ xw) * xw
        cnrm = np.sqrt((cdir**2).sum())
        if cnrm < TOL:
            raise FloatingPointError("cdir norm below tolerance")
        cdir = cdir / cnrm
        num = self.An.T @ cdir
        dot_xw = self.An.T @ xw
        stable = (dot_xw > -1.0 + 1e-14) & (1.0 - dot_xw**2 > 0.0)
        denom = np.where(stable, np.sqrt(np.maximum(1.0 - dot_xw**2, 0.0)), np.inf)
        return int(np.argmax(num / denom))

    def _reweight(self, f):
        xw = self.A @ self.w
        nw = np.sqrt((xw**2).sum())
        nw = 1.0 if nw == 0.0 else nw
        xf = self.A[:, f]
        nf = np.sqrt((xf**2).sum())
        bn_f = self.bn @ (xf / nf)
        bn_w = self.bn @ (xw / nw)
        f_w = (xw / nw) @ (xf / nf)
        gA = bn_f - bn_w * f_w
        gB = bn_w - bn_f * f_w
        if gA <= 0.0 or gB < 0.0:
            raise FloatingPointError("giga geodesic step degenerate")
        a = gB / (gA + gB) / nw
        bcoef = gA / (gA + gB) / nf
        x = a * xw + bcoef * xf
        nx = np.sqrt((x**2).sum())
        scale = self.bnorm / nx * ((x / nx) @ self.bn)
        self.w = a * scale * self.w
        self.w[f] = max(0.0, self.w[f] + bcoef * scale)


class OracleFrankWolfe(OracleSNNLS):
    """Frank-Wolfe on the weighted simplex (spec: reference snnls/frankwolfe.py)."""

    def __init__(self, A, b):
        super().__init__(A, b)
        self.norms = np.sqrt((self.A**2).sum(axis=0))
        if np.any(self.norms == 0):
            raise ValueError("A must not have zero columns")
        self.An = self.A / self.norms

    def _select(self):
        return int(np.argmax(self.An.T @ (self.b - self.A @ self.w)))

    def _reweight(self, f):
        if self.size() == 0:
            alpha, beta = 0.0, self.norms.sum() / self.norms[f]
        else:
            nsum, nf = self.norms.sum(), self.norms[f]
            xw = self.A @ self.w
            xf = self.A[:, f]
            dirn = nsum / nf * xf - xw
            num = dirn @ (self.b - xw)
            den = (dirn**2).sum()
            if num < 0.0 or den == 0.0 or num > den:
                raise FloatingPointError("frank-wolfe line search degenerate")
            alpha = 1.0 - num / den
            beta = nsum / nf * num / den
        self.w = alpha * self.w
        self.w[f] = max(0.0, self.w[f] + beta)


class OracleOrthoPursuit(OracleSNNLS):
    """Orthogonal matching pursuit with full NNLS re-solve
    (spec: reference snnls/orthopursuit.py)."""

    def __init__(self, A, b):
        super().__init__(A, b)
        norms = np.sqrt((self.A**2).sum(axis=0))
        if np.any(norms == 0):
            raise ValueError("A must not have zero columns")
        self.An = self.A / norms

    def _select(self):
        dots = self.An.T @ (self.b - self.A @ self.w)
        if self.size() == 0:
            return int(np.argmax(dots))
        fpos = int(np.argmax(dots))
        nz = np.where(self.w > 0)[0]
        fneg = nz[int(np.argmax(-dots[nz]))]
        return fpos if dots[fpos] >= -dots[fneg] else int(fneg)

    def _reweight(self, f):
        self.w[f] = 1.0
        nz = self.w > 0
        self.w[nz] = nnls_lawson_hanson(self.A[:, nz], self.b)
