"""Time the REFERENCE bilateral-solver formulation (scipy sparse CG on
CPU) against this repo's on-device solver at the same operating point.

The reference runs the Barron-Poole solver per image on the host through
a custom autograd Function (/root/reference/BilateralLayer.py:20-124,
BilateralGrid.py:43-207): forward = grid build + bistochastize + one
PCG solve per channel; backward = another PCG solve against the incoming
gradient.  tests/oracle_bilateral.py reimplements those equations from
the reference (scipy CSR + scipy.sparse.linalg.cg) and is used here as
the CPU baseline.  The device number comes from the same measurement
bench.py records (`bilateral_fwd_bwd_ms`).

Usage: python scripts/bench_bilateral_baseline.py [n_images]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from scipy.sparse import csr_matrix, diags
from scipy.sparse.linalg import cg

from oracle_bilateral import GridOracle, bistochastize

H = int(os.environ.get("BS_H", 120))
W = int(os.environ.get("BS_W", 160))
C = 3
# mode 0 (albedo) hyperparameters, BilateralLayer.py:131-143
SIGMA_LUMA, SIGMA_CHROMA, SIGMA_SPATIAL, LAM, MAXITER = 8.0, 2.0, 7.0, 200.0, 12


def one_fwd_bwd(im, target, conf, g_out):
    """Reference work for one image: forward solve + gradient solve.

    Mirrors BilateralLayer.py's per-image cost exactly: ONE grid build +
    ONE bistochastization (solveForGrad reuses the stored Dn/Dm,
    BilateralGrid.py:152-160), then a 3-channel PCG solve in the forward
    and another in the backward."""
    target = target.reshape(-1, C)
    conf = conf.reshape(-1, 1)
    g_out = g_out.reshape(-1, C)

    grid = GridOracle(im * 255.0, SIGMA_SPATIAL, SIGMA_LUMA, SIGMA_CHROMA)
    n, m = bistochastize(grid)
    Dn, Dm = diags(n, 0), diags(m, 0)
    v = grid.nvertices
    eye_rows = np.arange(v)
    blur_mat = csr_matrix((2 * grid.dim * np.ones(v), (eye_rows, eye_rows)))
    for b in grid.blurs:
        blur_mat = blur_mat + b
    a_smooth = Dm - Dn.dot(blur_mat.dot(Dn))
    w_splat = grid.splat(conf)
    A = LAM * a_smooth + diags(w_splat[:, 0], 0)
    a_diag = np.maximum(A.diagonal(), 1e-5)
    M = diags(1 / a_diag, 0)

    def pcg_solve(b, y0):
        y = np.empty_like(b)
        for d in range(b.shape[-1]):
            y[..., d], _ = cg(
                A, b[..., d], x0=y0[..., d], M=M, maxiter=MAXITER, rtol=1e-5
            )
        return y

    # forward (BilateralGrid.py:128-150)
    b_fwd = grid.splat(target * conf)
    yhat = pcg_solve(b_fwd, b_fwd / np.maximum(w_splat, 1e-10))
    # backward (BilateralGrid.py:162-184): plain splat of the out-gradient
    b_bwd = grid.splat(g_out)
    cnt = grid.splat(np.ones_like(conf))
    ygrad = pcg_solve(b_bwd, b_bwd / np.maximum(cnt, 1e-10))
    return grid.slice(yhat), grid.slice(ygrad)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.RandomState(0)
    times = []
    for i in range(n):
        im = rng.rand(H, W, 3)
        target = rng.rand(H, W, C)
        conf = rng.rand(H, W, 1)
        g_out = rng.randn(H, W, C)
        t0 = time.perf_counter()
        one_fwd_bwd(im, target, conf, g_out)
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    print(
        f"reference scipy solver (CPU): fwd+bwd per {H}x{W} image "
        f"min {times.min():.1f} ms  median {np.median(times):.1f} ms "
        f"over {n} random images"
    )


if __name__ == "__main__":
    main()
