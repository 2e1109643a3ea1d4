"""On-device differentiable bilateral-grid solver (Barron-Poole).

The reference runs this on CPU through scipy.sparse inside a custom
autograd Function, round-tripping GPU->numpy->GPU every forward AND
backward (/root/reference/BilateralLayer.py:20-124, BilateralGrid.py:43-207).
Here the whole pipeline is jit-able JAX on TPU with STATIC shapes:

  * 5-D XYLUV grid coordinates (BilateralGrid.py:46-59) — identical
    hashing semantics but no hash: the five small coordinates are packed
    into TWO int32 sort keys (field widths derived from the static
    image size and sigmas), and vertices are identified by a 2-key
    lexicographic sort (``jax.lax.sort``) + run-length unique, with a
    static vertex capacity ``v_max``.  Packing preserves per-field
    lexicographic order, so vertex ordering is identical to a 5-key sort
    while the comparator is 2.5x narrower;
  * the [1 0 1] per-dim blur adjacency (BilateralGrid.py:73-84) is built
    with ONE batched sort-merge join: shifted query sets (a +-1 shift of
    packed keys is one integer add) sort TOGETHER with the real vertex
    rows, and a query matches iff the first row of its equal-key run is
    a real vertex (the leader's tag rides a packed (ridx<<1)|tag cummax
    — no per-row gathers).  Dense mode scatters 10 neighbor-index
    tables (blur = 2*dim*y + 8 masked gathers + 2 rolls); edge mode
    (e_max) compacts only the links that EXIST — the adjacency is
    symmetric, so the join queries just the four positive directions
    and each match emits both directed links — and blur becomes one
    edge-count-row gather + segment_sum, the production default behind
    the exact capacity-bucket dispatchers (docs/kernels.md);
  * splat/slice = segment-sum / gather through the pixel->vertex map;
  * bistochastization (BilateralGrid.py:109-120) and Jacobi-preconditioned
    CG (BilateralGrid.py:128-150) run as ``lax.fori_loop``s with fixed
    iteration counts (the reference's cg_maxiter=10-12) plus convergence
    masking to mimic scipy's tol-based stop;
  * the backward is the reference's hand-derived gradient solve
    (BilateralGrid.py:152-184): CG against the incoming gradient as RHS
    (A is symmetric), grad_target = slice(yg)*w and grad_conf =
    slice(-yg*yhat) + slice(yg)*target — wired up as a ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# RGB -> YUV matrix + offset of the reference (BilateralGrid.py:13-22).
RGB_TO_YUV = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ]
)
YUV_OFFSET = np.array([0.0, 128.0, 128.0])

DIM = 5  # x, y, luma, u, v


class BilateralGrid(NamedTuple):
    """Static-shape bilateral grid for ONE image.

    vert_of_pixel: [N] int32 vertex id per pixel.
    nbr: int32 neighbor vertex ids, -1 if absent.  Dense mode: [2*DIM, V],
        one row per (dim, +-1).  Edge mode: [2, V] — only the two +-v roll
        rows; the eight gather directions live in the compact edge list.
    valid: [V] float32 1.0 for real vertices.
    edge_src/edge_dst: [E] int32 compact (src -> dst) links for the eight
        gather directions, padded with (0, v_max); None in dense mode.
    edge_count: [] int32 TRUE number of links (may exceed E — the caller's
        capacity bucket must hold it for the blur to be exact); None in
        dense mode.
    """

    vert_of_pixel: jnp.ndarray
    nbr: jnp.ndarray
    valid: jnp.ndarray
    edge_src: jnp.ndarray = None
    edge_dst: jnp.ndarray = None
    edge_count: jnp.ndarray = None

    @property
    def v_max(self):
        return self.valid.shape[0]


def _pack_widths(h, w, sigma_spatial, sigma_luma, sigma_chroma):
    """Static per-field bit widths for the packed 2-key coordinates.

    Each field stores coord+1 (bias keeps -1-shifted queries nonnegative)
    and needs one unit of headroom for the +1 shift, hence max+3 values.
    key1 = (cx | cy), key2 = (cl | cu | cv); both must fit 31 bits with
    the sentinel range above them.
    """

    def bits(maxv):
        return max(int(np.ceil(np.log2(maxv + 3))), 1)

    bx = bits((w - 1) / sigma_spatial)
    by = bits((h - 1) / sigma_spatial)
    blm = bits(256.0 / sigma_luma)
    bu = bits(256.0 / sigma_chroma)
    bv = bits(256.0 / sigma_chroma)
    assert bx + by <= 30, (bx, by)
    assert blm + bu + bv <= 30, (blm, bu, bv)
    return bx, by, blm, bu, bv


def _packed_coords(image_rgb, sigma_spatial, sigma_luma, sigma_chroma,
                   widths=None):
    """Pixel -> packed (key1, key2) int32 grid coords (BilateralGrid.py:46-59
    semantics: floor-divided XYLUV), flattened [N] each.

    image_rgb: [H, W, 3] in the 0..255 range (callers multiply by 255 like
    BilateralLayer.py:52).  ``widths``: the caller's `_pack_widths` result
    (build_grid passes its own so the pixel packing and the neighbor-join
    deltas can never desynchronize).
    """
    h, w = image_rgb.shape[:2]
    _, by, _, bu, bv = widths if widths is not None else _pack_widths(
        h, w, sigma_spatial, sigma_luma, sigma_chroma
    )
    yuv = image_rgb @ jnp.asarray(RGB_TO_YUV.T, image_rgb.dtype) + jnp.asarray(
        YUV_OFFSET, image_rgb.dtype
    )
    # Keep packed fields in range.  Guides above 1.0 (possible: the
    # max-normalization clamps the divisor to <=1, BilateralLayer.py:
    # 250-253, and HDR training images exceed 1) clip into the top grid
    # cells here.  The reference has the SAME 256-cell domain constraint
    # — its integer hash requires every scaled coordinate < MAX_VAL and
    # silently ALIASES arbitrary cells together beyond it
    # (BilateralGrid.py:56-59) — so clipping (which merges only
    # neighboring top cells, deterministically) is the strictly safer
    # behavior, not a parity break.
    yuv = jnp.clip(yuv, 0.0, 256.0)
    iy, ix = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    cx = (ix / sigma_spatial).astype(jnp.int32)
    cy = (iy / sigma_spatial).astype(jnp.int32)
    cl = (yuv[..., 0] / sigma_luma).astype(jnp.int32)
    cu = (yuv[..., 1] / sigma_chroma).astype(jnp.int32)
    cv = (yuv[..., 2] / sigma_chroma).astype(jnp.int32)
    k1 = ((cx + 1) << by) | (cy + 1)
    k2 = ((cl + 1) << (bu + bv)) | ((cu + 1) << bv) | (cv + 1)
    return k1.reshape(-1), k2.reshape(-1)


# Sentinel keys above every packable value (fields use <=30 bits).
_SENT_REAL = jnp.int32(2**30 + 2)  # invalid real vertex rows
_SENT_QUERY = jnp.int32(2**30 + 1)  # hidden query rows (!= _SENT_REAL)


def _blocked_scan(op, identity, x, block: int = 4608):
    """1-D inclusive scan as a 2-D row scan + row-total offsets.

    XLA's 1-D cumulative-op lowering costs ~50 ms (cumsum) / ~12 ms
    (cummax) at the ~700k-row neighbor-join length on v5e; scanning the
    rows of a [R, block] reshape and combining with the scanned row
    totals is ~6x faster and exact (op must be associative)."""
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), identity, x.dtype)])
    x2 = x.reshape(-1, block)
    rows = op(x2, axis=1)
    totals = op(rows[:, -1], axis=0)
    offs = jnp.concatenate(
        [jnp.full((1,), identity, x.dtype), totals[:-1]]
    )
    if op is jnp.cumsum:
        out = rows + offs[:, None]
    else:
        out = jnp.maximum(rows, offs[:, None])
    return out.reshape(-1)[:n]


def _cumsum1d(x):
    return _blocked_scan(jnp.cumsum, 0, x)


def _cummax1d(x):
    return _blocked_scan(
        jax.lax.cummax, jnp.iinfo(jnp.int32).min, x
    )


def build_grid(
    image_rgb: jnp.ndarray,
    sigma_spatial: float,
    sigma_luma: float,
    sigma_chroma: float,
    v_max: int,
    e_max: int = None,
) -> BilateralGrid:
    """Build the grid for one [H, W, 3] image (values scaled to 0..255).

    ``e_max``: optional static capacity for a COMPACT edge list of the
    eight gather-direction neighbor links.  Real guides occupy few of the
    10 potential links per vertex (random-noise worst cases occupy almost
    none), so the blur's gather rows shrink from 8*V to edge_count when
    the capacity holds — see :func:`blur`.  None keeps the dense [10, V]
    neighbor tables."""
    h, w = image_rgb.shape[:2]
    widths = _pack_widths(h, w, sigma_spatial, sigma_luma, sigma_chroma)
    _, by, _, bu, bv = widths
    k1, k2 = _packed_coords(
        image_rgb, sigma_spatial, sigma_luma, sigma_chroma, widths=widths
    )
    n = k1.shape[0]

    s1, s2, pix_idx = jax.lax.sort(
        [k1, k2, jnp.arange(n, dtype=jnp.int32)], num_keys=2
    )
    is_new = (s1 != jnp.roll(s1, 1)) | (s2 != jnp.roll(s2, 1))
    is_new = is_new.at[0].set(True)
    vid_sorted = _cumsum1d(is_new.astype(jnp.int32)) - 1
    # Capacity clamp: cells beyond v_max all merge into the LAST vertex.
    # The default capacity (one vertex per pixel, BilateralNets.v_max
    # None -> H*W) can never overflow; a user-set smaller v_max trades
    # exactness at that one vertex for speed.  The min/max scatters below
    # keep the merged vertex's key (and thus the whole grid) DETERMINISTIC
    # even then: for legitimate duplicates every write carries the same
    # value, so min/max == set.
    vid_sorted = jnp.minimum(vid_sorted, v_max - 1)
    nvert = vid_sorted[-1] + 1

    # pixel -> vertex (scatter back to original pixel order)
    vert_of_pixel = jnp.zeros((n,), jnp.int32).at[pix_idx].set(vid_sorted)

    # vertex -> packed keys
    vk1 = jnp.full((v_max,), _SENT_REAL, jnp.int32).at[vid_sorted].min(s1)
    vk2 = jnp.zeros((v_max,), jnp.int32).at[vid_sorted].max(s2)
    vidx = jnp.arange(v_max, dtype=jnp.int32)
    valid = (vidx < nvert).astype(jnp.float32)
    invalid = valid < 0.5

    # ---- the +-v neighbors are FREE: vertex ids are assigned in packed-key
    # sort order and no key lies strictly between k and k+1, so the (v,+1)
    # neighbor of vertex i, when it exists, is exactly vertex i+1.  blur()
    # turns these two directions into masked rolls instead of gathers.
    nk1 = jnp.roll(vk1, -1)
    nk2 = jnp.roll(vk2, -1)
    has_vp = (
        (nk1 == vk1) & (nk2 == vk2 + 1)
        & (vidx + 1 < nvert)
    )
    nbr_vp = jnp.where(has_vp, vidx + 1, -1)
    pk2 = jnp.roll(vk2, 1)
    has_vm = (
        (jnp.roll(vk1, 1) == vk1) & (pk2 == vk2 - 1) & (vidx > 0) & ~invalid
    )
    nbr_vm = jnp.where(has_vm, vidx - 1, -1)

    # ---- the remaining eight (dim, +-1) neighbor joins in ONE sort --------
    # A +-1 shift of dim d is an integer add on the packed key; the field
    # bias/headroom guarantees no carry into adjacent fields.  The
    # real/query tag rides the low bit of key2 (real first within a run)
    # and (join id, vertex id) pack into one payload word, so the sort has
    # 3 operands instead of 6.
    #
    # Edge mode only needs the four POSITIVE directions: the [1 0 1] blur
    # adjacency is symmetric (b = key_a + delta exists iff a = key_b -
    # delta exists), so each (+delta) match emits BOTH directed links and
    # the join shrinks from 9V to 5V rows — the sort, the two scans, and
    # the compaction scatter all scale with it.  The dense tables keep
    # the full 8-query join (they need per-direction rows).
    if e_max is not None:
        deltas = [  # positive directions only: x, y, luma, u
            (0, (1 << by)), (0, 1),
            (1, (1 << (bu + bv))), (1, (1 << bv)),
        ]
    else:
        deltas = [  # (key index, add) in nbr order: d major, off=-1, +1
            (0, -(1 << by)), (0, (1 << by)),  # x
            (0, -1), (0, 1),  # y
            (1, -(1 << (bu + bv))), (1, (1 << (bu + bv))),  # luma
            (1, -(1 << bv)), (1, (1 << bv)),  # u
        ]
    n_join = len(deltas)
    qk1 = jnp.concatenate(
        [vk1 + d1 if ki == 0 else vk1 for ki, d1 in deltas]
    )
    qk2 = jnp.concatenate(
        [vk2 + d2 if ki == 1 else vk2 for ki, d2 in deltas]
    )
    # hide query rows of invalid vertices so they can't match anything
    inv_t = jnp.tile(invalid, n_join)
    qk1 = jnp.where(inv_t, _SENT_QUERY, qk1)
    qk2 = jnp.where(inv_t, 0, qk2)

    all1 = jnp.concatenate([vk1, qk1])
    # key2 carries the tag in its low bit (k2 uses <=30 bits, so k2<<1|tag
    # fits int32); payload packs (join id, vertex id).
    all2 = jnp.concatenate([vk2 << 1, (qk2 << 1) | 1])
    payload = jnp.concatenate(
        [vidx,
         jnp.repeat(jnp.arange(n_join, dtype=jnp.int32), v_max) * v_max
         + jnp.tile(vidx, n_join)]
    )
    s1a, s2a, spay = jax.lax.sort([all1, all2, payload], num_keys=2)

    # Run leader = first row of each equal-key run; a real vertex (tag 0)
    # sorts first within its run, so query rows match iff their leader is
    # real.  (Distinct joins can produce equal query keys, so the match is
    # against the run LEADER, not just the previous row.)
    #
    # The leader's tag rides a PACKED cummax scan — (ridx << 1) | tag of
    # the run-start rows propagated forward (ridx < 2^21 for any sane
    # v_max, so the pack fits int32 and the position term dominates the
    # max) — instead of an m-row `stag[run_start]` gather: per-row
    # gathers on the scalar core cost ~11 ms at this length and were the
    # top non-while ops of the whole step.
    m = s1a.shape[0]
    assert m < (1 << 30), m  # (ridx << 1) | tag must fit int32
    stag = s2a & 1
    sk2 = s2a >> 1
    ridx = jnp.arange(m, dtype=jnp.int32)
    run_new = (s1a != jnp.roll(s1a, 1)) | (sk2 != jnp.roll(sk2, 1))
    run_new = run_new.at[0].set(True)
    lead = _cummax1d(jnp.where(run_new, (ridx << 1) | stag, -1))
    leader_tag = lead & 1
    run_start = lead >> 1

    is_q = stag == 1
    match = is_q & (leader_tag == 0)

    if e_max is not None:
        # Compact edge list: each matched (+delta) query row IS a
        # symmetric PAIR of links between the leader and the query's own
        # vertex.  One cumsum assigns each pair its slot; one
        # [m, 2]-payload scatter writes (scatter cost is per ROW, width
        # is free).  The leader's PAYLOAD is resolved AFTER compaction —
        # scatter the run-start positions, then gather spay at only
        # e_max/2 rows instead of m (padded rows read spay[0]
        # harmlessly; their sentinel dst = v_max drops both directed
        # links from the blur).  Overflowing pairs land in the
        # sacrificial row and are sliced off — callers check
        # edge_count <= e_max for exactness.
        e_pairs = e_max // 2
        assert e_pairs * 2 == e_max, e_max  # capacity counts DIRECTED links
        epos = _cumsum1d(match.astype(jnp.int32)) - 1
        dstq = spay % v_max  # query payload = j*v_max + own vertex id
        write = match & (epos < e_pairs)
        slot = jnp.where(write, epos, e_pairs)
        payload2 = jnp.stack(
            [jnp.where(write, run_start, 0), jnp.where(write, dstq, v_max)],
            axis=1,
        )
        buf = jnp.concatenate(
            [jnp.zeros((e_pairs + 1, 1), jnp.int32),
             jnp.full((e_pairs + 1, 1), v_max, jnp.int32)], axis=1
        ).at[slot].set(payload2)
        lead_v = spay[buf[:e_pairs, 0]]
        own_v = buf[:e_pairs, 1]
        pad = own_v == v_max
        return BilateralGrid(
            vert_of_pixel=vert_of_pixel,
            nbr=jnp.stack([nbr_vm, nbr_vp]),
            valid=valid,
            edge_src=jnp.concatenate(
                [lead_v, jnp.minimum(own_v, v_max - 1)]
            ),
            edge_dst=jnp.concatenate(
                [own_v, jnp.where(pad, v_max, lead_v)]
            ),
            edge_count=2 * jnp.sum(match.astype(jnp.int32)),
        )

    leader_pay = spay[run_start]
    slot = jnp.where(is_q, spay, m)  # == j*v_max + v; non-query rows dropped
    nbr_flat = jnp.full((n_join * v_max,), -1, jnp.int32)
    nbr_flat = nbr_flat.at[slot].set(
        jnp.where(match, leader_pay, -1), mode="drop"
    )
    nbr = jnp.concatenate(
        [nbr_flat.reshape(n_join, v_max), nbr_vm[None], nbr_vp[None]], axis=0
    )
    return BilateralGrid(
        vert_of_pixel=vert_of_pixel,
        nbr=nbr,
        valid=valid,
    )


def splat(grid: BilateralGrid, x: jnp.ndarray) -> jnp.ndarray:
    """[N, C] pixel values -> [V, C] vertex sums (S @ x)."""
    return jax.ops.segment_sum(
        x, grid.vert_of_pixel, num_segments=grid.v_max
    )


def slice_(grid: BilateralGrid, y: jnp.ndarray) -> jnp.ndarray:
    """[V, C] vertex values -> [N, C] per-pixel (S^T y ... gather)."""
    return y[grid.vert_of_pixel]


def blur(grid: BilateralGrid, y: jnp.ndarray) -> jnp.ndarray:
    """[1 2 1]-per-dim blur: 2*DIM*y + sum of neighbor contributions
    (BilateralGrid.py:96-103).

    XLA TPU gathers run on the scalar core (~6 cycles/row measured on
    v5e) and dominate the whole solver, so the two +-v directions use the
    build-time guarantee that their neighbors are ADJACENT rows of the
    key-sorted vertex array: masked rolls on the VPU instead of gathers.

    The other eight directions have no such structure.  Dense mode pays
    8 V-row gathers; edge mode (build_grid with e_max) pays one
    edge_count-row gather + one scatter-add over only the links that
    EXIST — most of the 10 potential links per vertex don't (random
    noise: almost none; real photos: a fraction), so this is the
    dominant row-count reduction of the whole solver."""
    out = 2.0 * DIM * y
    if grid.edge_src is not None:
        contrib = jax.ops.segment_sum(
            y[grid.edge_src], grid.edge_dst, num_segments=grid.v_max + 1
        )
        out = out + contrib[:-1]
        vm, vp = grid.nbr[0], grid.nbr[1]
    else:
        for i in range(2 * DIM - 2):
            idx = grid.nbr[i]
            contrib = jnp.where(
                (idx >= 0)[:, None], y[jnp.maximum(idx, 0)], 0.0
            )
            out = out + contrib
        vm, vp = grid.nbr[2 * DIM - 2], grid.nbr[2 * DIM - 1]
    # v-1 / v+1: adjacent-row links (vm[i] in {-1, i-1}, vp[i] in
    # {-1, i+1} by construction in build_grid)
    out = out + jnp.where((vm >= 0)[:, None], jnp.roll(y, 1, axis=0), 0.0)
    out = out + jnp.where((vp >= 0)[:, None], jnp.roll(y, -1, axis=0), 0.0)
    return out


def bistochastize(grid: BilateralGrid, maxiter: int = 10):
    """Diagonal bistochastization (BilateralGrid.py:109-120)."""
    m = splat(
        grid, jnp.ones((grid.vert_of_pixel.shape[0], 1), jnp.float32)
    )[:, 0]
    n0 = jnp.ones((grid.v_max,), jnp.float32)

    def body(_, n):
        bl = blur(grid, n[:, None])[:, 0]
        return jnp.sqrt(n * m / jnp.maximum(bl, 1e-20))

    n = jax.lax.fori_loop(0, maxiter, body, n0, unroll=5)
    m = n * blur(grid, n[:, None])[:, 0]
    return n, m


def _pcg(a_fn, b, y0, a_diag, maxiter, tol, miter=None):
    """Jacobi-preconditioned CG with scipy-style rtol stopping (masked).

    The reference solves each channel with its OWN scipy CG
    (BilateralGrid.py:146-150 loops channels).  Here the channels share
    the batched [V, C] blur/matvec (the gathers are the cost and are
    row-count-bound, so batching them is 3x cheaper than per-channel
    solves) but every CG SCALAR is a per-channel [C] vector — alpha,
    beta, residual norms, and the convergence mask — which makes the
    iterates exactly the independent per-channel Krylov sequences of the
    reference, not one shared polynomial tuned to the dominant channel.

    ``maxiter`` is the STATIC loop bound; ``miter`` optionally bounds
    THIS problem's iterations with a traced scalar <= maxiter (updates
    freeze once i >= miter) — how the multi-problem batched solve runs
    modes with different reference cg_maxiter in one shared loop."""
    minv = 1.0 / a_diag  # [V]

    def prec(r):
        return r * minv[:, None]

    def csum(x):  # per-channel sums [C]
        return jnp.sum(x, axis=0)

    r0 = b - a_fn(y0)
    z0 = prec(r0)
    atol = jnp.maximum(tol * jnp.sqrt(csum(b * b)), 0.0)  # [C]

    def body(i, state):
        y, r, z, p, rz = state
        done = jnp.sqrt(csum(r * r)) <= atol  # [C]
        if miter is not None:
            done = done | (i >= miter)
        ap = a_fn(p)
        denom = csum(p * ap)
        alpha = jnp.where(jnp.abs(denom) > 0, rz / denom, 0.0)
        alpha = jnp.where(done, 0.0, alpha)  # [C]
        y = y + alpha * p
        r = r - alpha * ap
        z = prec(r)
        rz_new = csum(r * z)
        beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
        p = jnp.where(done, p, z + beta * p)
        return (y, r, z, p, rz_new)

    state = (y0, r0, z0, z0, csum(r0 * z0))
    y, *_ = jax.lax.fori_loop(0, maxiter, body, state, unroll=4)
    return y


def _solve_system(grid, n, m, w_splat, b, lam, a_diag_min, cg_maxiter,
                  cg_tol, y0, miter=None):
    """Solve (lam*A_smooth + diag(w_splat)) y = b — the shared PCG core of
    the forward (BilateralGrid.py:128-150) and gradient (152-184) solves.
    ``w_splat`` [V] and the RHS ``b`` [V, C] are precomputed splats."""

    def a_fn(y):
        smooth = m[:, None] * y - n[:, None] * blur(grid, n[:, None] * y)
        return lam * smooth + w_splat[:, None] * y

    a_diag = lam * (m - 2.0 * DIM * n * n) + w_splat
    a_diag = jnp.maximum(a_diag, a_diag_min)
    return _pcg(a_fn, b, y0, a_diag, cg_maxiter, cg_tol, miter)


class BSParams(NamedTuple):
    """Per-mode hyperparameters (BilateralLayer.py:131-189)."""

    sigma_luma: float
    sigma_chroma: float
    sigma_spatial: float
    lam: float
    a_diag_min: float = 1e-5
    cg_tol: float = 1e-5
    cg_maxiter: int = 10


# mode -> params: 0 albedo, 1 normal, 2 rough, 4 depth
MODE_PARAMS = {
    0: BSParams(8.0, 2.0, 7.0, 200.0, cg_maxiter=12),
    1: BSParams(0.5, 0.5, 0.5, 5.0, cg_maxiter=10),
    2: BSParams(8.0, 2.0, 8.0, 300.0, cg_maxiter=10),
    4: BSParams(4.0, 2.0, 4.0, 100.0, cg_maxiter=10),
}


def _solve_image(grid, target, conf, params: BSParams, nm=None, miter=None):
    """Forward solve for one image (BilateralGrid.py:122-150).

    target [N, C], conf [N, 1]. Returns (xhat [N, C], yhat [V, C]).
    ``nm``: optionally the precomputed ``bistochastize(grid)`` pair.
    ``params`` fields may be traced scalars except cg_maxiter (the
    static loop bound); ``miter``: see :func:`_pcg`."""
    n, m = bistochastize(grid) if nm is None else nm
    # one fused splat for conf AND target*conf (the scatter runs on the
    # scalar core; one pass over the pixels instead of two)
    s = splat(grid, jnp.concatenate([conf, target * conf], axis=1))
    w_splat, b = s[:, 0], s[:, 1:]
    y0 = b / jnp.maximum(w_splat[:, None], 1e-10)
    yhat = _solve_system(
        grid, n, m, w_splat, b, params.lam, params.a_diag_min,
        params.cg_maxiter, params.cg_tol, y0, miter,
    )
    return slice_(grid, yhat), yhat


def _solve_image_grad(grid, nm, g_out, conf, target, yhat, params: BSParams,
                      miter=None):
    """Gradient solve for one image (BilateralGrid.py:152-184).

    ``nm``: the (n, m) bistochastization pair cached by the forward —
    grid and nm are custom-VJP residuals, NOT rebuilt here (the grid
    build's sorts are the most expensive part of the whole op)."""
    n, m = nm
    # one fused splat: conf (matrix diagonal), ones (y0 denominator), and
    # the incoming gradient (the reference's plain-splat RHS,
    # BilateralGrid.py:168-171)
    ones = jnp.ones_like(conf)
    s = splat(grid, jnp.concatenate([conf, ones, g_out], axis=1))
    w_splat, cnt, b = s[:, 0], s[:, 1], s[:, 2:]
    y0 = b / jnp.maximum(cnt[:, None], 1e-10)
    yg = _solve_system(
        grid, n, m, w_splat, b, params.lam, params.a_diag_min,
        params.cg_maxiter, params.cg_tol, y0, miter,
    )

    sliced = slice_(grid, yg)
    grad_target = sliced * conf
    grad_conf_map = slice_(grid, -yg * yhat) + sliced * target
    grad_conf = jnp.sum(grad_conf_map, axis=1, keepdims=True)
    return grad_target, grad_conf


def _stats_of(grid: BilateralGrid) -> dict:
    """Per-image occupancy stats of a (vmapped) grid: true vertex and edge
    counts, for callers to validate their static capacity buckets."""
    nvert = jnp.sum(grid.valid, axis=-1).astype(jnp.int32)
    nedges = (
        grid.edge_count
        if grid.edge_count is not None
        else jnp.zeros_like(nvert)
    )
    return {"nvert": nvert, "nedges": nedges}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bilateral_solve_core(feature, target, conf, params: BSParams,
                          v_max: int, e_max):
    xhat, _, grid, _ = _bs_fwd_impl(feature, target, conf, params, v_max,
                                    e_max)
    return xhat, _stats_of(grid)


def bilateral_solve(feature, target, conf, params: BSParams, v_max: int,
                    e_max: int = None):
    """Differentiable bilateral solve, batched NHWC.

    feature [B,H,W,3]: guide image for the grid (scaled *255 inside, like
    BilateralLayer.py:52); target [B,H,W,C]: signal to refine;
    conf [B,H,W,1]: per-pixel confidence. Gradients flow to target and
    conf only (the reference's BilateralFunction returns None for image).
    ``e_max``: optional static edge capacity (see :func:`build_grid`).
    Returns refined [B,H,W,C].
    """
    return _bilateral_solve_core(feature, target, conf, params, v_max,
                                 e_max)[0]


def bilateral_solve_stats(feature, target, conf, params: BSParams,
                          v_max: int, e_max: int = None):
    """Like :func:`bilateral_solve` but also returns the per-image grid
    occupancy stats {nvert, nedges} so capacity-bucketed callers can
    check ``nvert <= v_max and nedges <= e_max`` (exactness) from the
    step outputs instead of paying a separate counting pass."""
    return _bilateral_solve_core(feature, target, conf, params, v_max, e_max)


def _grid_of(feature, params, v_max, e_max=None):
    return build_grid(
        feature * 255.0, params.sigma_spatial, params.sigma_luma,
        params.sigma_chroma, v_max, e_max,
    )


def _bs_fwd_impl(feature, target, conf, params, v_max, e_max):
    b, h, w, c = target.shape

    def one(feat_i, tgt_i, conf_i):
        grid = _grid_of(feat_i, params, v_max, e_max)
        nm = bistochastize(grid)
        xhat, yhat = _solve_image(
            grid, tgt_i.reshape(-1, c), conf_i.reshape(-1, 1), params, nm=nm
        )
        return xhat.reshape(h, w, c), yhat, grid, nm

    return jax.vmap(one)(feature, target, conf)


def _bs_fwd(feature, target, conf, params, v_max, e_max):
    xhat, yhat, grid, nm = _bs_fwd_impl(feature, target, conf, params, v_max,
                                        e_max)
    # The grid (int index tables) and its bistochastization are residuals:
    # the backward's only heavy work is then its own PCG solve — round 1
    # rebuilt both from scratch (11 sorts + 10 blurs) every backward.
    return (xhat, _stats_of(grid)), (feature, target, conf, yhat, grid, nm)


def _bs_bwd(params, v_max, e_max, res, g):
    feature, target, conf, yhat, grid, nm = res
    g_xhat = g[0]  # g[1] is the int stats cotangent (symbolic zero)
    b, h, w, c = target.shape

    def one(grid_i, nm_i, g_i, conf_i, tgt_i, yhat_i):
        gt, gc = _solve_image_grad(
            grid_i,
            nm_i,
            g_i.reshape(-1, c),
            conf_i.reshape(-1, 1),
            tgt_i.reshape(-1, c),
            yhat_i,
            params,
        )
        return gt.reshape(h, w, c), gc.reshape(h, w, 1)

    gt, gc = jax.vmap(one)(grid, nm, g_xhat, conf, target, yhat)
    return (jnp.zeros_like(feature), gt, gc)


_bilateral_solve_core.defvjp(_bs_fwd, _bs_bwd)


# ---------------------------------------------------------------------------
# Multi-mode batched solve
#
# The bilateral TRAIN step runs THREE independent solves off the same guide
# (albedo / rough / depth, different sigmas and lambdas).  Run sequentially,
# each pays its own bistochastize/PCG whiles, join sort, scans, and
# compaction scatter.  Batching all K*B problems along one leading axis
# shares those launches: grids are built per mode (sigmas are static pack
# widths) and STACKED, targets pad to the widest channel count (payload
# width is ~free), and the per-mode lambda / tolerance / iteration count
# ride as traced per-problem scalars — iterations beyond a mode's own
# cg_maxiter are masked in _pcg, so the iterates are exactly the per-mode
# reference sequences.
# ---------------------------------------------------------------------------


def _stack_mode_grids(guide, params_seq, v_max, e_max):
    """Per-mode vmapped grid builds concatenated along the problem axis
    (mode-major: [mode0 images..., mode1 images..., ...])."""
    grids = [
        jax.vmap(lambda f, p=p: _grid_of(f, p, v_max, e_max))(guide)
        for p in params_seq
    ]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *grids
    )


def _multi_scalars(params_seq, batch, max_steps):
    def arr(get, dtype):
        return jnp.concatenate(
            [jnp.full((batch,), get(p), dtype) for p in params_seq]
        )

    return (
        arr(lambda p: p.lam, jnp.float32),
        arr(lambda p: p.a_diag_min, jnp.float32),
        arr(lambda p: p.cg_tol, jnp.float32),
        arr(lambda p: min(p.cg_maxiter, max_steps), jnp.int32),
    )


def _bs_multi_fwd_impl(guide, targets, confs, params_seq, v_max, e_max):
    b, h, w, _ = guide.shape
    cmax = max(t.shape[-1] for t in targets)
    max_steps = max(p.cg_maxiter for p in params_seq)
    grid = _stack_mode_grids(guide, params_seq, v_max, e_max)
    tgt = jnp.concatenate(
        [
            jnp.pad(t, ((0, 0),) * 3 + ((0, cmax - t.shape[-1]),))
            for t in targets
        ],
        axis=0,
    )
    cf = jnp.concatenate(confs, axis=0)
    lam, admin, tol, miter = _multi_scalars(params_seq, b, max_steps)

    def one(grid_i, tgt_i, conf_i, lam_i, admin_i, tol_i, miter_i):
        nm = bistochastize(grid_i)
        pp = BSParams(0.0, 0.0, 0.0, lam_i, admin_i, tol_i, max_steps)
        xhat, yhat = _solve_image(
            grid_i, tgt_i.reshape(-1, cmax), conf_i.reshape(-1, 1), pp,
            nm=nm, miter=miter_i,
        )
        return xhat.reshape(h, w, cmax), yhat, nm

    xhat, yhat, nm = jax.vmap(one)(grid, tgt, cf, lam, admin, tol, miter)
    outs = tuple(
        xhat[i * b:(i + 1) * b, ..., : t.shape[-1]]
        for i, t in enumerate(targets)
    )
    st = _stats_of(grid)
    stats = tuple(
        {k: v[i * b:(i + 1) * b] for k, v in st.items()}
        for i in range(len(targets))
    )
    return outs, stats, (grid, nm, yhat, tgt, cf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bilateral_solve_multi_core(guide, targets, confs, params_seq,
                                v_max, e_max):
    outs, stats, _ = _bs_multi_fwd_impl(
        guide, targets, confs, params_seq, v_max, e_max
    )
    return outs, stats


def _bs_multi_fwd(guide, targets, confs, params_seq, v_max, e_max):
    outs, stats, res = _bs_multi_fwd_impl(
        guide, targets, confs, params_seq, v_max, e_max
    )
    return (outs, stats), (guide, res)


def _bs_multi_bwd(params_seq, v_max, e_max, residuals, g):
    guide, (grid, nm, yhat, tgt, cf) = residuals
    g_outs = g[0]  # g[1]: int stats cotangent (symbolic zero)
    b, h, w = guide.shape[0], tgt.shape[1], tgt.shape[2]
    cmax = tgt.shape[-1]
    max_steps = max(p.cg_maxiter for p in params_seq)
    g_all = jnp.concatenate(
        [
            jnp.pad(go, ((0, 0),) * 3 + ((0, cmax - go.shape[-1]),))
            for go in g_outs
        ],
        axis=0,
    )
    lam, admin, tol, miter = _multi_scalars(params_seq, b, max_steps)

    def one(grid_i, nm_i, g_i, conf_i, tgt_i, yhat_i, lam_i, admin_i,
            tol_i, miter_i):
        pp = BSParams(0.0, 0.0, 0.0, lam_i, admin_i, tol_i, max_steps)
        gt, gc = _solve_image_grad(
            grid_i, nm_i, g_i.reshape(-1, cmax), conf_i.reshape(-1, 1),
            tgt_i.reshape(-1, cmax), yhat_i, pp, miter=miter_i,
        )
        return gt.reshape(h, w, cmax), gc.reshape(h, w, 1)

    gt, gc = jax.vmap(one)(grid, nm, g_all, cf, tgt, yhat, lam, admin,
                           tol, miter)
    g_targets = tuple(
        gt[i * b:(i + 1) * b, ..., : go.shape[-1]]
        for i, go in enumerate(g_outs)
    )
    g_confs = tuple(gc[i * b:(i + 1) * b] for i in range(len(g_outs)))
    return (jnp.zeros_like(guide), g_targets, g_confs)


_bilateral_solve_multi_core.defvjp(_bs_multi_fwd, _bs_multi_bwd)


def bilateral_solve_multi(guide, targets, confs, params_seq, v_max: int,
                          e_max: int = None):
    """Batched multi-mode bilateral solve off one guide.

    guide [B,H,W,3]; targets/confs: sequences of [B,H,W,Ck] / [B,H,W,1]
    aligned with ``params_seq`` (a tuple of BSParams).  Returns
    (list of refined [B,H,W,Ck], list of per-mode stats dicts) — the
    same numerics as K separate :func:`bilateral_solve_stats` calls
    (per-mode lambda/tolerance/iteration count are honored exactly via
    masked shared loops), with all K*B problems sharing each sort /
    scan / scatter / while launch."""
    outs, stats = _bilateral_solve_multi_core(
        guide, tuple(targets), tuple(confs), tuple(params_seq), v_max,
        e_max,
    )
    return list(outs), list(stats)


# ---------------------------------------------------------------------------
# Exact auto-capacity dispatch
#
# `v_max` is a STATIC shape: the default one-vertex-per-pixel upper bound
# (H*W = 76 800 at the reference's 240x320) can never overflow, but every
# gather/sort row in the solver scales with it, and real guides occupy far
# fewer grid cells.  Counting the occupied cells costs one extra 2-key sort
# of the pixels; rounding the count UP to a capacity from a small static
# ladder keeps the number of distinct jit signatures bounded while the
# solve itself runs at (near) the true vertex count.  Results are EXACT:
# whenever nvert <= v_max no cells merge, and the padded rows are inert by
# construction (splat writes only real vertices, neighbor joins hide
# invalid queries), so a bucketed solve equals the full-capacity solve up
# to reduction order.
# ---------------------------------------------------------------------------


def count_vertices(guide_rgb01: jnp.ndarray, params: BSParams) -> jnp.ndarray:
    """Occupied-grid-cell count per image for a [B, H, W, 3] guide in 0..1
    (scaled *255 internally like the solve itself). Returns [B] int32."""

    def one(img):
        k1, k2 = _packed_coords(
            img * 255.0, params.sigma_spatial, params.sigma_luma,
            params.sigma_chroma,
        )
        s1, s2 = jax.lax.sort([k1, k2], num_keys=2)
        is_new = (s1 != jnp.roll(s1, 1)) | (s2 != jnp.roll(s2, 1))
        is_new = is_new.at[0].set(True)
        return jnp.sum(is_new.astype(jnp.int32))

    return jax.vmap(one)(guide_rgb01)


def bucket_capacity(nvert: int, n_pixels: int,
                    ladder=(16, 8, 4, 2, 1)) -> int:
    """Smallest capacity from the static ladder {ceil(N/k)} that holds
    ``nvert`` (falls back to one-vertex-per-pixel)."""
    for k in ladder:
        cap = -(-n_pixels // k)
        if cap >= nvert:
            return cap
    return n_pixels


def edge_bucket(nedges: int, v_max: int, min_cap: int = 1024) -> int:
    """Static edge capacity: smallest power of two >= nedges (>= min_cap),
    capped at the 8*v_max upper bound of the eight gather directions.
    Power-of-two rounding bounds the number of distinct jit signatures at
    ~13 while keeping the blur's gather/scatter rows near the true link
    count."""
    full = 8 * v_max
    cap = max(int(nedges), min_cap)
    cap = 1 << (cap - 1).bit_length()
    return min(cap, full)


class BucketedSolver:
    """jit-cache wrapper around :func:`bilateral_solve` with exact
    auto-capacity: count on device, round up to a ladder bucket, dispatch
    to the per-(params, capacity) compiled solve.

    Each distinct (params, bucket) pair compiles once; the count is one
    small jitted sort per distinct params.  Use :meth:`counts` to batch
    the device->host sync when several modes share one guide (the
    testReal chain runs albedo/rough/depth off the same albedo guide).

    ``use_edges``: also dispatch the compact edge-list blur capacity
    (see :func:`build_grid`): the solve returns its true edge count, an
    overflowing call is re-run at the bumped power-of-two bucket (every
    returned result is exact), and the bucket tightens to the running
    max of observed counts for subsequent calls."""

    def __init__(self, ladder=(16, 8, 4, 2, 1), use_edges=True):
        self.ladder = tuple(ladder)
        self.use_edges = use_edges
        self._count = {}
        self._solve = {}
        self._ecap = {}  # (params, v_cap) -> edge bucket for the next call
        self._seen = {}  # (params, v_cap) -> running max observed nedges

    def counts(self, guide, params_seq) -> list:
        """Max-over-batch vertex count for each params in one jit call."""
        key = tuple(params_seq)
        if key not in self._count:
            self._count[key] = jax.jit(
                lambda g: jnp.stack(
                    [jnp.max(count_vertices(g, p)) for p in key]
                )
            )
        return [int(v) for v in np.asarray(self._count[key](guide))]

    def _jit_solve(self, params, v_cap, e_cap):
        sk = (params, v_cap, e_cap)
        if sk not in self._solve:
            # positional call: custom_vjp nondiff_argnums reject keywords
            self._solve[sk] = jax.jit(
                lambda g, t, c, p=params, v=v_cap, e=e_cap:
                bilateral_solve_stats(g, t, c, p, v, e)
            )
        return self._solve[sk]

    def solve(self, guide, target, conf, params: BSParams, nvert: int):
        n_pixels = guide.shape[1] * guide.shape[2]
        cap = bucket_capacity(nvert, n_pixels, self.ladder)
        if not self.use_edges:
            out, _ = self._jit_solve(params, cap, None)(guide, target, conf)
            return out
        key = (params, cap)
        ecap = self._ecap.get(key, edge_bucket(2 * nvert, cap))
        while True:
            out, stats = self._jit_solve(params, cap, ecap)(
                guide, target, conf
            )
            nedges = int(np.asarray(stats["nedges"]).max())
            if nedges <= ecap:
                seen = max(self._seen.get(key, 0), nedges)
                self._seen[key] = seen
                self._ecap[key] = edge_bucket(seen, cap)
                return out
            ecap = edge_bucket(nedges, cap)

    def solve_many(self, guide, targets, confs, params_seq, nverts):
        """Solve several modes OFF THE SAME GUIDE in one jit dispatch.

        The testReal chain runs albedo/rough/depth refinement back to
        back; per-call dispatch overhead on remote backends (~5 ms on
        the axon tunnel) and the lost overlap make three calls
        needlessly slow.  Buckets follow the same per-(params, v_cap)
        observed-count policy as :meth:`solve`; an overflowed mode is
        re-solved ALONE through the per-mode cache (the other modes'
        results stand — the combined program is never recompiled or
        re-executed for one mode's bump; ADVICE r3).  Every returned
        result is exact.  Returns refined arrays in ``params_seq``
        order."""
        n_pixels = guide.shape[1] * guide.shape[2]
        vcaps = [
            bucket_capacity(nv, n_pixels, self.ladder) for nv in nverts
        ]
        if self.use_edges:
            ecaps = [
                self._ecap.get((p, vc), edge_bucket(2 * nv, vc))
                for p, vc, nv in zip(params_seq, vcaps, nverts)
            ]
        else:
            ecaps = [None] * len(vcaps)
        key = tuple(zip(params_seq, vcaps, ecaps))
        if key not in self._solve:
            def f(g, ts, cs, key=key):
                return tuple(
                    bilateral_solve_stats(g, t, c, p, vc, ec)
                    for t, c, (p, vc, ec) in zip(ts, cs, key)
                )

            self._solve[key] = jax.jit(f)
        pairs = self._solve[key](guide, tuple(targets), tuple(confs))
        outs = [out for out, _ in pairs]
        if not self.use_edges:
            return outs
        for i, ((p, vc, ec), (_, st)) in enumerate(zip(key, pairs)):
            nedges = int(np.asarray(st["nedges"]).max())
            seen = max(self._seen.get((p, vc), 0), nedges)
            self._seen[(p, vc)] = seen
            self._ecap[(p, vc)] = edge_bucket(seen, vc)
            if nedges > ec:
                # exact re-run of just this mode at the bumped bucket
                # (solve() reads the freshly-bumped self._ecap entry)
                outs[i] = self.solve(
                    guide, targets[i], confs[i], p, nverts[i]
                )
        return outs

    def __call__(self, guide, target, conf, params: BSParams):
        (nvert,) = self.counts(guide, (params,))
        return self.solve(guide, target, conf, params, nvert)
