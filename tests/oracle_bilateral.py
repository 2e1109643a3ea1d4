"""scipy-sparse float64 oracle for the bilateral grid solver.

Written from the reference equations (BilateralGrid.py:43-207): hash-based
vertex dedup, CSR splat, [1 0 1] per-dim blur matrices, bistochastization,
Jacobi-PCG solve. Independent of the JAX implementation.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix, diags
from scipy.sparse.linalg import cg

RGB_TO_YUV = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
)
YUV_OFFSET = np.array([0.0, 128.0, 128.0])
MAX_VAL = 255.0


class GridOracle:
    def __init__(self, im, sigma_spatial, sigma_luma, sigma_chroma):
        yuv = np.tensordot(im, RGB_TO_YUV, ([2], [1])) + YUV_OFFSET
        iy, ix = np.mgrid[: im.shape[0], : im.shape[1]]
        coords = np.dstack(
            (
                (ix / sigma_spatial).astype(int),
                (iy / sigma_spatial).astype(int),
                (yuv[..., 0] / sigma_luma).astype(int),
                (yuv[..., 1] / sigma_chroma).astype(int),
                (yuv[..., 2] / sigma_chroma).astype(int),
            )
        ).reshape(-1, 5)
        self.npixels, self.dim = coords.shape
        hv = MAX_VAL ** np.arange(self.dim)
        hashed = coords @ hv
        uh, ui, idx = np.unique(hashed, return_index=True, return_inverse=True)
        uc = coords[ui]
        self.nvertices = len(uc)
        self.S = csr_matrix(
            (np.ones(self.npixels), (idx, np.arange(self.npixels)))
        )
        self.blurs = []
        for d in range(self.dim):
            blur = 0.0
            for off in (-1, 1):
                ov = np.zeros((1, self.dim))
                ov[:, d] = off
                nh = (uc + ov) @ hv
                locs = np.clip(np.searchsorted(uh, nh), 0, len(uh) - 1)
                vi = np.flatnonzero(uh[locs] == nh)
                blur = blur + csr_matrix(
                    (np.ones(len(vi)), (vi, locs[vi])),
                    shape=(self.nvertices, self.nvertices),
                )
            self.blurs.append(blur)

    def splat(self, x):
        return self.S.dot(x)

    def slice(self, y):
        return self.S.T.dot(y)

    def blur(self, x):
        out = 2 * self.dim * x
        for b in self.blurs:
            out = out + b.dot(x)
        return out


def bistochastize(grid, maxiter=10):
    m = grid.splat(np.ones(grid.npixels))
    n = np.ones(grid.nvertices)
    for _ in range(maxiter):
        n = np.sqrt(n * m / grid.blur(n))
    m = n * grid.blur(n)
    return n, m


def solve_oracle(grid, target, conf, lam, a_diag_min=1e-5, cg_maxiter=12,
                 cg_tol=1e-5):
    """target [N, C], conf [N, 1] -> (xhat [N, C], yhat [V, C])."""
    n, m = bistochastize(grid)
    Dn, Dm = diags(n, 0), diags(m, 0)
    a_smooth = Dm - Dn.dot(
        diags(np.ones(grid.nvertices) * 0, 0)
        + csr_matrix(
            (2 * grid.dim * np.ones(grid.nvertices),
             (np.arange(grid.nvertices), np.arange(grid.nvertices)))
        ).dot(Dn)
    )
    # Full blur operator as matrix: 2*dim*I + sum(blurs)
    blur_mat = csr_matrix(
        (2 * grid.dim * np.ones(grid.nvertices),
         (np.arange(grid.nvertices), np.arange(grid.nvertices)))
    )
    for b in grid.blurs:
        blur_mat = blur_mat + b
    a_smooth = Dm - Dn.dot(blur_mat.dot(Dn))
    w_splat = grid.splat(conf)
    A = lam * a_smooth + diags(w_splat[:, 0], 0)
    b = grid.splat(target * conf)
    a_diag = np.maximum(A.diagonal(), a_diag_min)
    M = diags(1 / a_diag, 0)
    y0 = grid.splat(target * conf) / np.maximum(w_splat, 1e-10)
    yhat = np.empty_like(y0)
    for d in range(target.shape[-1]):
        yhat[..., d], _ = cg(
            A, b[..., d], x0=y0[..., d], M=M, maxiter=cg_maxiter, rtol=cg_tol
        )
    return grid.slice(yhat), yhat
