"""On-device bilateral grid/solver vs the scipy-sparse float64 oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import oracle_bilateral as ob
from inverserenderingofindoorscene_tpu.ops import bilateral as bl

H, W = 24, 32
N = H * W
VMAX = N


def make_image(seed=0, smooth=True):
    rng = np.random.RandomState(seed)
    im = rng.rand(H, W, 3)
    if smooth:
        # piecewise-constant-ish guide so the grid has real structure
        im = np.round(im * 4) / 4.0
    return im.astype(np.float64)


@pytest.fixture(scope="module")
def grids():
    im = make_image()
    params = dict(sigma_spatial=6.0, sigma_luma=8.0, sigma_chroma=8.0)
    oracle = ob.GridOracle(im * 255.0, params["sigma_spatial"],
                           params["sigma_luma"], params["sigma_chroma"])
    grid = jax.jit(
        lambda x: bl.build_grid(x, params["sigma_spatial"],
                                params["sigma_luma"], params["sigma_chroma"],
                                VMAX)
    )(jnp.asarray(im * 255.0, jnp.float32))
    return im, oracle, grid


def test_grid_vertex_count(grids):
    _, oracle, grid = grids
    assert int(grid.valid.sum()) == oracle.nvertices


def test_splat_blur_slice_match(grids):
    _, oracle, grid = grids
    rng = np.random.RandomState(1)
    x = rng.rand(N, 2)

    s_o = oracle.splat(x)  # [V_o, 2]
    s_j = np.asarray(bl.splat(grid, jnp.asarray(x, jnp.float32)))
    nv = oracle.nvertices
    # vertex ORDER should agree: both sort lexicographically... the oracle
    # orders by hash = c0 + 255 c1 + 255^2 c2 + ... (little-endian radix) while
    # ours sorts lexicographically by (c0, c1, ..., c4) (big-endian on c0).
    # Compare as SETS via sorting rows.
    def canon(a):
        a = a[: len(s_o)]
        return a[np.lexsort(a.T)]

    np.testing.assert_allclose(canon(s_j), canon(s_o), rtol=1e-5)

    b_o = oracle.blur(oracle.splat(x))
    b_j = np.asarray(
        bl.blur(grid, bl.splat(grid, jnp.asarray(x, jnp.float32)))
    )[:nv]
    np.testing.assert_allclose(canon(b_j), canon(b_o), rtol=1e-4)

    sl_o = oracle.slice(oracle.blur(oracle.splat(x)))
    sl_j = np.asarray(
        bl.slice_(
            grid, bl.blur(grid, bl.splat(grid, jnp.asarray(x, jnp.float32)))
        )
    )
    np.testing.assert_allclose(sl_j, sl_o, rtol=1e-4)


def test_bistochastize_match(grids):
    _, oracle, grid = grids
    n_o, m_o = ob.bistochastize(oracle)
    n_j, m_j = jax.jit(bl.bistochastize)(grid)
    nv = oracle.nvertices

    def canon(a):
        return np.sort(np.asarray(a)[:nv])

    np.testing.assert_allclose(canon(n_j), np.sort(n_o), rtol=1e-4)
    np.testing.assert_allclose(canon(m_j), np.sort(m_o), rtol=1e-4)


def test_solve_matches_oracle(grids):
    im, oracle, grid = grids
    rng = np.random.RandomState(2)
    target = rng.rand(N, 3)
    conf = rng.rand(N, 1) * 0.9 + 0.1
    params = bl.BSParams(8.0, 8.0, 6.0, 50.0, cg_maxiter=30)

    xhat_o, _ = ob.solve_oracle(
        oracle, target, conf, lam=50.0, cg_maxiter=30
    )
    xhat_j, _ = jax.jit(
        lambda t, c: bl._solve_image(grid, t, c, params)
    )(jnp.asarray(target, jnp.float32), jnp.asarray(conf, jnp.float32))
    # pixel-space outputs must agree regardless of vertex ordering
    np.testing.assert_allclose(
        np.asarray(xhat_j), xhat_o, rtol=5e-3, atol=5e-3
    )


def test_custom_vjp_matches_reference_equations(grids):
    """grad wrt target of sum(w_out * xhat) must equal slice(yg)*conf where
    yg solves A yg = splat(w_out) — i.e. the solveGrad path, which for the
    linear-in-target forward is also checkable by finite differences."""
    im, _, _ = grids
    rng = np.random.RandomState(3)
    feature = jnp.asarray(im[None], jnp.float32)
    target = jnp.asarray(rng.rand(1, H, W, 2), jnp.float32)
    conf = jnp.asarray(rng.rand(1, H, W, 1) * 0.9 + 0.1, jnp.float32)
    params = bl.BSParams(8.0, 8.0, 6.0, 20.0, cg_maxiter=40, cg_tol=1e-7)
    gw = jnp.asarray(rng.rand(1, H, W, 2), jnp.float32)

    def loss(t):
        out = bl.bilateral_solve(feature, t, conf, params, VMAX)
        return jnp.sum(out * gw)

    g = jax.jit(jax.grad(loss))(target)
    # finite differences on a few random pixels (jit the probe: ten
    # un-jitted op-by-op solver evaluations dominated this test's time)
    jloss = jax.jit(loss)
    eps = 1e-2
    for _ in range(5):
        i, j, k = rng.randint(H), rng.randint(W), rng.randint(2)
        tp = target.at[0, i, j, k].add(eps)
        tm = target.at[0, i, j, k].add(-eps)
        fd = (float(jloss(tp)) - float(jloss(tm))) / (2 * eps)
        np.testing.assert_allclose(
            float(g[0, i, j, k]), fd, rtol=5e-2, atol=5e-3
        )


def test_conf_grad_finite():
    rng = np.random.RandomState(4)
    im = make_image(5)
    feature = jnp.asarray(im[None], jnp.float32)
    target = jnp.asarray(rng.rand(1, H, W, 1), jnp.float32)
    conf = jnp.asarray(rng.rand(1, H, W, 1) * 0.9 + 0.1, jnp.float32)
    params = bl.MODE_PARAMS[0]

    def loss(c):
        out = bl.bilateral_solve(feature, target, c, params, VMAX)
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(loss))(conf)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_count_vertices_matches_oracle(grids):
    im, oracle, _ = grids
    # grids fixture: sigma_spatial=6, sigma_luma=8, sigma_chroma=8;
    # count_vertices takes the 0..1 guide and scales *255 itself.
    params = bl.BSParams(8.0, 8.0, 6.0, 50.0)
    nv = jax.jit(lambda g: bl.count_vertices(g, params))(
        jnp.asarray(im[None], jnp.float32)
    )
    assert int(nv[0]) == oracle.nvertices


def test_bucket_capacity_ladder():
    assert bl.bucket_capacity(1, 768) == 48  # ceil(768/16)
    assert bl.bucket_capacity(48, 768) == 48
    assert bl.bucket_capacity(49, 768) == 96
    assert bl.bucket_capacity(767, 768) == 768
    assert bl.bucket_capacity(768, 768) == 768


def test_bucketed_solver_exact():
    """Auto-capacity dispatch must equal the full one-vertex-per-pixel
    solve (padded rows are inert; only reduction order differs)."""
    rng = np.random.RandomState(7)
    # strongly quantized guide + wide sigmas -> lands in a sub-full bucket
    im = np.round(rng.rand(H, W, 3) * 2) / 2.0
    feature = jnp.asarray(im[None], jnp.float32)
    target = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    conf = jnp.asarray(rng.rand(1, H, W, 1) * 0.9 + 0.1, jnp.float32)
    params = bl.BSParams(16.0, 16.0, 8.0, 50.0, cg_maxiter=12)

    solver = bl.BucketedSolver()
    (nv,) = solver.counts(feature, (params,))
    cap = bl.bucket_capacity(nv, N)
    assert cap < N, (nv, cap)  # the test must exercise a smaller bucket
    out_auto = solver(feature, target, conf, params)
    out_full = jax.jit(
        lambda f, t, c: bl.bilateral_solve(f, t, c, params, N)
    )(feature, target, conf)
    np.testing.assert_allclose(
        np.asarray(out_auto), np.asarray(out_full), rtol=2e-5, atol=2e-5
    )


def test_edge_mode_matches_dense():
    """The compact edge-list blur (build_grid e_max) must reproduce the
    dense 10-table blur exactly up to reduction order, for outputs AND
    the custom-VJP gradients, at a tight power-of-two capacity."""
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 4.0)], -1)
    im = np.clip(base + rng.randn(H, W, 3) * 0.02, 0, 1)
    feature = jnp.asarray(np.stack([im, im[:, ::-1]]), jnp.float32)
    target = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)
    conf = jnp.asarray(rng.rand(2, H, W, 1) * 0.9 + 0.1, jnp.float32)
    params = bl.BSParams(16.0, 8.0, 4.0, 100.0, cg_maxiter=12)

    def loss(t, c, e_max):
        out = bl.bilateral_solve(feature, t, c, params, N, e_max)
        return jnp.sum(jnp.sin(out)), out

    (_, out_d), g_d = jax.value_and_grad(
        lambda t, c: loss(t, c, None), argnums=(0, 1), has_aux=True
    )(target, conf)
    _, stats = jax.jit(
        lambda t, c: bl.bilateral_solve_stats(feature, t, c, params, N,
                                              8 * N)
    )(target, conf)
    nedges = int(np.asarray(stats["nedges"]).max())
    assert nedges > 0  # the smooth guide must produce real links
    cap = bl.edge_bucket(nedges, N, min_cap=64)
    assert cap < 8 * N  # and the bucket must be genuinely compact
    (_, out_e), g_e = jax.value_and_grad(
        lambda t, c: loss(t, c, cap), argnums=(0, 1), has_aux=True
    )(target, conf)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_e[0]), np.asarray(g_d[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_e[1]), np.asarray(g_d[1]),
                               rtol=2e-4, atol=2e-5)


def test_multi_solve_matches_sequential():
    """bilateral_solve_multi (all modes batched along one problem axis)
    must reproduce the sequential per-mode solves: bit-identical to a
    channel-padded sequential solve, within f32 reduction-order noise of
    the plain one.  (A/B-measured SLOWER on the chip — kept as a tested
    ablation; pipeline/bilateral.py runs sequential solves.)"""
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 4.0)], -1)
    guide = jnp.asarray(
        np.clip(np.stack([base, base[:, ::-1]])
                + rng.randn(2, H, W, 3) * 0.02, 0, 1),
        jnp.float32,
    )
    ps = tuple(bl.MODE_PARAMS[m] for m in (0, 2, 4))
    ts = tuple(
        jnp.asarray(rng.rand(2, H, W, c), jnp.float32) for c in (3, 1, 1)
    )
    cs = tuple(
        jnp.asarray(rng.rand(2, H, W, 1) * 0.9 + 0.1, jnp.float32)
        for _ in range(3)
    )
    E = 8 * N

    def multi_loss(ts, cs):
        outs, stats = bl.bilateral_solve_multi(guide, ts, cs, ps, N, E)
        return sum(jnp.sum(jnp.sin(o)) for o in outs), (outs, stats)

    (_, (om, st)), gm = jax.value_and_grad(
        multi_loss, argnums=(0, 1), has_aux=True
    )(ts, cs)

    for i, (p, t, c) in enumerate(zip(ps, ts, cs)):
        pad = jnp.pad(t, ((0, 0),) * 3 + ((0, 3 - t.shape[-1]),))
        out_pad, st_seq = bl.bilateral_solve_stats(guide, pad, c, p, N, E)
        np.testing.assert_array_equal(
            np.asarray(om[i]), np.asarray(out_pad[..., : t.shape[-1]]),
            err_msg=f"mode {i}",
        )
        for k in st_seq:
            np.testing.assert_array_equal(
                np.asarray(st[i][k]), np.asarray(st_seq[k]),
                err_msg=f"mode {i} {k}",
            )
        # the grad must be BIT-identical to the channel-padded
        # sequential solve's (the only difference between multi and
        # plain sequential is that padding's f32 reduction order, which
        # CG amplifies — so compare exactly against the padded program)
        gt = jax.grad(
            lambda tt: jnp.sum(jnp.sin(
                bl.bilateral_solve(guide, tt, c, p, N, E)[
                    ..., : t.shape[-1]
                ]
            ))
        )(pad)
        np.testing.assert_array_equal(
            np.asarray(gm[0][i]), np.asarray(gt[..., : t.shape[-1]]),
            err_msg=f"mode {i} grad",
        )


def test_edge_bucket_ladder():
    assert bl.edge_bucket(0, 768) == 1024
    assert bl.edge_bucket(1025, 768) == 2048
    assert bl.edge_bucket(10**9, 768) == 8 * 768
    assert bl.edge_bucket(100, 768, min_cap=64) == 128


def test_blocked_scan_matches_numpy():
    rng = np.random.RandomState(0)
    for n in (5, 4608, 4609, 100_001):
        x = jnp.asarray(rng.randint(-5, 7, size=n), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(bl._cumsum1d(x)), np.cumsum(np.asarray(x))
        )
        np.testing.assert_array_equal(
            np.asarray(bl._cummax1d(x)),
            np.maximum.accumulate(np.asarray(x)),
        )


def test_bilateral_train_step():
    """Full trainBRDFBilateral-equivalent step at tiny resolution."""
    from inverserenderingofindoorscene_tpu.data.synthetic import synthetic_batch
    from inverserenderingofindoorscene_tpu.pipeline.bilateral import BilateralNets
    from inverserenderingofindoorscene_tpu.pipeline.brdf import BRDFNets
    from inverserenderingofindoorscene_tpu.train.steps import (
        create_train_state,
        make_bilateral_train_step,
        reference_adam,
    )

    im_hw = (32, 32)
    brdf_nets = BRDFNets(cascade_level=0)
    bs_nets = BilateralNets()
    bp = brdf_nets.init(jax.random.PRNGKey(0), im_hw)
    sp = bs_nets.init(jax.random.PRNGKey(1), im_hw)
    batch = synthetic_batch(batch=2, im_hw=im_hw, env_rc=(16, 16), seed=0)
    state = create_train_state(sp, reference_adam(1e-4))
    step = jax.jit(make_bilateral_train_step(brdf_nets, bs_nets, bp))
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 1
    assert 0 < int(metrics["nvert_max"]) <= 32 * 32
    assert int(metrics["nedges_max"]) == 0  # dense mode reports no edges
    # gradient actually reached the confidence CNNs
    gsum = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), state.params, 0.0
    )
    assert np.isfinite(gsum)

    # edge-capacity step: same losses as the dense step on the same batch
    state_e = create_train_state(sp, reference_adam(1e-4))
    step_e = jax.jit(make_bilateral_train_step(
        brdf_nets, BilateralNets(e_max=8 * 32 * 32), bp))
    state_e, metrics_e = step_e(state_e, batch)
    for k in ("albedo_bs", "rough_bs", "depth_bs", "total"):
        np.testing.assert_allclose(
            float(metrics_e[k]), float(metrics[k]), rtol=1e-4
        )
    assert int(metrics_e["nedges_max"]) >= 0


def test_solve_many_bumps_only_overflowed_mode():
    """An edge-bucket overflow inside solve_many must re-solve ONLY the
    overflowed mode (through the per-mode cache) — the combined program
    is compiled once per bucket combination and never re-executed for a
    single mode's bump — and every returned result must be exact vs an
    ample-capacity reference solve (ADVICE r3)."""
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 4.0)], -1)
    guide = jnp.asarray(
        np.clip(base[None] + rng.randn(1, H, W, 3) * 0.02, 0, 1),
        jnp.float32,
    )
    ps = tuple(bl.MODE_PARAMS[m] for m in (0, 2, 4))
    ts = tuple(
        jnp.asarray(rng.rand(1, H, W, c), jnp.float32) for c in (3, 1, 1)
    )
    cs = tuple(
        jnp.asarray(rng.rand(1, H, W, 1) * 0.9 + 0.1, jnp.float32)
        for _ in range(3)
    )
    solver = bl.BucketedSolver()
    nverts = solver.counts(guide, ps)
    n_pixels = H * W
    vcaps = [bl.bucket_capacity(nv, n_pixels) for nv in nverts]
    # seed mode 1 with a deliberately-overflowing tiny edge bucket
    solver._ecap[(ps[1], vcaps[1])] = bl.edge_bucket(1, vcaps[1],
                                                     min_cap=16)
    outs = solver.solve_many(guide, ts, cs, ps, nverts)

    def n_combined():
        # combined keys are tuples of (params, vcap, ecap) triples;
        # per-mode keys are flat (BSParams, vcap, ecap) triples
        return sum(
            1 for k in solver._solve if isinstance(k[0], tuple)
            and not isinstance(k[0], bl.BSParams)
        )

    assert n_combined() == 1  # ONE combined program, despite the bump
    # the bump went through the per-mode cache: at least one per-mode
    # entry for mode 1's params exists
    assert any(
        isinstance(k[0], bl.BSParams) and k[0] == ps[1]
        for k in solver._solve
    )
    for i, (p, t, c) in enumerate(zip(ps, ts, cs)):
        ref = jax.jit(
            lambda tt, cc, p=p: bl.bilateral_solve(guide, tt, cc, p, N,
                                                   8 * N)
        )(t, c)
        np.testing.assert_allclose(
            np.asarray(outs[i]), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"mode {i}",
        )
    # a second call at the now-tightened buckets adds ONE more combined
    # program (new bucket combo) and does not grow further after that
    solver.solve_many(guide, ts, cs, ps, nverts)
    n2 = n_combined()
    solver.solve_many(guide, ts, cs, ps, nverts)
    assert n_combined() == n2 <= 2
