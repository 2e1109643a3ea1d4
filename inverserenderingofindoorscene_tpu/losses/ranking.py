"""IIW pairwise reflectance ranking loss.

Semantics match the reference ``BatchRankingLoss``
(/root/reference/models.py:526-563): the predicted albedo is channel-mean
reduced to a reflectance map, log(r + 1e-3), and human point-pair
judgements are scored as

  equal pairs:  w * (log r1 - log r2)^2
  darker pairs: w * relu(log r2 - log r1 + tau)^2,  tau = 0.5

averaged over the (padded) pair list.  Padded pairs carry weight 0 so the
static pair count (max_num=800 per kind in the IIW loader) is part of the
mean denominator exactly like the reference's fixed-size arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

TAU = 0.5


def batch_ranking_loss(
    albedo_pred: jnp.ndarray,
    eq_point: jnp.ndarray,
    eq_weight: jnp.ndarray,
    darker_point: jnp.ndarray,
    darker_weight: jnp.ndarray,
    eq_num=None,
    darker_num=None,
):
    """Compute (eq_loss, darker_loss) for one image.

    albedo_pred: [H, W, 3] (NHWC single image; the reference passes the
      CHW image and means over channels — models.py:530).
    eq_point / darker_point: [N, 4] int (r1, c1, r2, c2).
    eq_weight / darker_weight: [N] float (0 for padding).
    eq_num / darker_num: actual row counts — the reference slices the
      padded arrays before torch.mean (wrapperIIW.py:89-100), so with
      zero-weight padding the mean denominator is the count, not N.
      Default: the full padded length (plain mean).
    """
    width = albedo_pred.shape[1]
    reflect_log = jnp.log(jnp.mean(albedo_pred, axis=-1) + 0.001).reshape(-1)
    if eq_num is None:
        eq_num = eq_weight.shape[0]
    if darker_num is None:
        darker_num = darker_weight.shape[0]

    def pair_diffs(points):
        p1 = points[:, 0] * width + points[:, 1]
        p2 = points[:, 2] * width + points[:, 3]
        return reflect_log[p1], reflect_log[p2]

    rf1, rf2 = pair_diffs(eq_point)
    eq_loss = jnp.sum(eq_weight * (rf1 - rf2) ** 2) / jnp.maximum(eq_num, 1)

    rf1, rf2 = pair_diffs(darker_point)
    darker_loss = jnp.sum(
        darker_weight * jnp.maximum(rf2 - rf1 + TAU, 0.0) ** 2
    ) / jnp.maximum(darker_num, 1)
    return eq_loss, darker_loss
