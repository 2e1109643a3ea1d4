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


def restore_checkpoint(exp_dir, stage, cascade, epoch, target):
    """target: a pytree of the same structure (e.g. from ``init``).

    Restores SHARDING-PRESERVING: any target leaf that is a committed
    ``jax.Array`` (e.g. a TrainState ``device_put`` onto a {data, tile}
    mesh) is restored directly to its sharding — orbax reads each shard
    on its devices instead of round-tripping a host copy, which is the
    multi-host resume path (the reference's equivalent is whole-module
    ``torch.load``, trainBRDF.py:90-103).  Uncommitted/host leaves
    restore as host values like before."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(exp_dir, stage, cascade, epoch)
    ckptr = ocp.StandardCheckpointer()

    def spec(x):
        if isinstance(x, jax.Array) and x.committed:
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return jax.device_get(x)

    return ckptr.restore(path, target=jax.tree_util.tree_map(spec, target))


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
