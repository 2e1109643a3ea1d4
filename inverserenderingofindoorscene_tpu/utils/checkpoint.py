"""Checkpoint save/restore keyed by (stage, cascade, step).

The reference saves whole torch modules per epoch with the
``{name}{cascadeLevel}_{epoch}.pth`` convention and resumes by reloading
state dicts with an LR rescale (/root/reference/trainBRDF.py:90-103,
392-396).  Here checkpoints are orbax pytree checkpoints of
``{"params": ..., "opt_state": ..., "step": ...}`` under
``{exp_dir}/{stage}{cascade}_{epoch}`` — sharded-array-aware, so the same
API covers single-chip and multi-host runs.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np


def _ckpt_dir(exp_dir: str, stage: str, cascade: int, epoch: int) -> str:
    return osp.abspath(osp.join(exp_dir, f"{stage}{cascade}_{epoch}"))


def save_checkpoint(exp_dir, stage, cascade, epoch, state):
    """state: any pytree (e.g. TrainState fields dict)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(exp_dir, stage, cascade, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def _restore_tree(path, target):
    """Sharding-preserving orbax restore of ``target``'s structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()

    def spec(x):
        if isinstance(x, jax.Array) and x.committed:
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return jax.device_get(x)

    return ckptr.restore(path, target=jax.tree_util.tree_map(spec, target))


def restore_checkpoint(exp_dir, stage, cascade, epoch, target):
    """target: a pytree of the same structure (e.g. from ``init``).

    Restores SHARDING-PRESERVING: any target leaf that is a committed
    ``jax.Array`` (e.g. a TrainState ``device_put`` onto a {data, tile}
    mesh) is restored directly to its sharding — orbax reads each shard
    on its devices instead of round-tripping a host copy, which is the
    multi-host resume path (the reference's equivalent is whole-module
    ``torch.load``, trainBRDF.py:90-103).  Uncommitted/host leaves
    restore as host values like before."""
    return _restore_tree(_ckpt_dir(exp_dir, stage, cascade, epoch), target)


def latest_epoch(exp_dir, stage, cascade):
    """Largest epoch with a saved checkpoint, or None."""
    if not osp.isdir(exp_dir):
        return None
    best = None
    prefix = f"{stage}{cascade}_"
    for name in os.listdir(exp_dir):
        if name.startswith(prefix):
            try:
                e = int(name[len(prefix):])
            except ValueError:
                continue
            best = e if best is None else max(best, e)
    return best


def lr_scale_for_epoch(epoch: int) -> float:
    """Reference LR halving every 10 epochs (trainBRDF.py:90-103)."""
    return 1.0 / (2.0 ** int(np.floor((epoch + 1) / 10.0)))


# ---------------------------------------------------------------------------
# Preemption-grade per-step checkpoints.
#
# The reference only saves whole modules once per epoch
# (trainBRDF.py:392-396) — a preempted run loses up to an epoch of work.
# Step checkpoints save {state, epoch, step-in-epoch} every N steps under
# ``{stage}{cascade}_step_{epoch}_{j}``; `--resume auto` in the train CLIs
# restores the most recent of the epoch/step checkpoints, including the
# LR schedule (carried by opt_state/step) and the data-epoch position
# (the loaders' augmentation streams are keyed by (seed, epoch, item), so
# skipping the first j+1 batches reproduces the exact remaining stream).
# ---------------------------------------------------------------------------


def _step_dir(exp_dir, stage, cascade, epoch, j):
    return osp.abspath(
        osp.join(exp_dir, f"{stage}{cascade}_step_{epoch}_{j}")
    )


def list_step_checkpoints(exp_dir, stage, cascade):
    """Sorted [(epoch, step_in_epoch)] of on-disk step checkpoints."""
    if not osp.isdir(exp_dir):
        return []
    prefix = f"{stage}{cascade}_step_"
    out = []
    for name in os.listdir(exp_dir):
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix):].split("_")
        if len(parts) != 2:
            continue
        try:
            out.append((int(parts[0]), int(parts[1])))
        except ValueError:
            continue
    return sorted(out)


def save_step_checkpoint(exp_dir, stage, cascade, state, epoch, j, keep=2):
    """Save state mid-epoch (after step ``j`` of ``epoch``) and prune all
    but the newest ``keep`` step checkpoints."""
    import shutil

    import orbax.checkpoint as ocp

    path = _step_dir(exp_dir, stage, cascade, epoch, j)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"state": jax.device_get(state), "epoch": int(epoch),
         "j": int(j)},
        force=True,
    )
    ckptr.wait_until_finished()
    entries = list_step_checkpoints(exp_dir, stage, cascade)
    for e, jj in entries[:-keep] if keep else entries:
        shutil.rmtree(_step_dir(exp_dir, stage, cascade, e, jj),
                      ignore_errors=True)
    return path


def restore_step_checkpoint(exp_dir, stage, cascade, epoch, j, target):
    """-> (state, epoch, step_in_epoch); sharding-preserving like
    :func:`restore_checkpoint`."""
    tree = _restore_tree(
        _step_dir(exp_dir, stage, cascade, epoch, j),
        {"state": target, "epoch": 0, "j": 0},
    )
    return tree["state"], int(tree["epoch"]), int(tree["j"])
