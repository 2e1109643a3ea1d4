"""Jit-able training steps for the staged pipeline.

The reference trains each stage with per-module Adam(lr=1e-4, betas=(0.5,
0.999)) optimizers and halves the LR every 10 epochs
(/root/reference/trainBRDF.py:124-128,374-384).  Per-module Adam with equal
hyperparameters is exactly one Adam over the combined pytree (Adam is
per-parameter), so each stage here is a single optax chain over the trained
modules' params; frozen modules simply aren't part of the optimized tree.

Each ``make_*_train_step`` returns a pure ``step(state, batch) -> (state,
metrics)`` suitable for ``jax.jit`` on one chip or for ``shard_map`` over a
mesh (pass ``axis_name``: losses psum pixel counts, and gradients are
automatically all-reduced by the psum inside the loss because the loss is
already the global mean — with data sharding we additionally psum the grads).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from inverserenderingofindoorscene_tpu.pipeline.brdf import (
    BRDFNets,
    brdf_step,
    brdf_total_error,
)
from inverserenderingofindoorscene_tpu.pipeline.bilateral import (
    BilateralNets,
    bilateral_step,
    bilateral_total_error,
)
from inverserenderingofindoorscene_tpu.pipeline.light import (
    LightNets,
    light_step,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def reference_adam(lr: float = 1e-4, epoch_decay_steps: Optional[int] = None):
    """Adam(lr, betas=(0.5, 0.999), eps=1e-8) with the reference's halving.

    If ``epoch_decay_steps`` (steps per 10 epochs) is given, lr is halved
    every that many steps, matching trainBRDF.py:374-384.

    The learning rate is ALWAYS a schedule (constant when no decay) so the
    optax state tree is identical with and without decay — cross-stage
    checkpoint restore (save with schedule, load with constant) would
    otherwise fail on an orbax tree-structure mismatch.
    """
    if epoch_decay_steps is None:
        sched = lambda step: lr  # noqa: E731
    else:
        sched = lambda step: lr * 0.5 ** (step // epoch_decay_steps)  # noqa: E731
    return optax.adam(learning_rate=sched, b1=0.5, b2=0.999, eps=1e-8)


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_brdf_train_step(
    nets: BRDFNets,
    albedo_w: float = 1.5,
    normal_w: float = 1.0,
    rough_w: float = 0.5,
    depth_w: float = 0.5,
    axis_name: Optional[str] = None,
):
    """trainBRDF.py:242-294 as one pure function."""

    def loss_fn(params, batch):
        _, errors = brdf_step(nets, params, batch, axis_name=axis_name)
        total = brdf_total_error(errors, albedo_w, normal_w, rough_w, depth_w)
        return total, errors

    def step(state: TrainState, batch):
        (total, errors), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        if axis_name is not None:
            # Loss sums are already psum-ed global means, so per-chip grads
            # are partial sums of the global gradient: add them up.
            grads = jax.lax.psum(grads, axis_name)
        state = state.apply_gradients(grads)
        metrics = dict(errors)
        metrics["total"] = total
        return state, metrics

    return step


def make_light_train_step(
    brdf_nets: BRDFNets,
    light_nets: LightNets,
    brdf_params,
    reconst_w: float = 10.0,
    render_w: float = 1.0,
    offset: float = 1.0,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
):
    """trainLight.py:215-244: frozen BRDF nets, optimize the 4 light modules.

    ``brdf_params`` is closed over (frozen); only the light params live in
    the train state.
    """
    frozen = jax.lax.stop_gradient(brdf_params)

    def loss_fn(light_params, batch):
        losses, _ = light_step(
            brdf_nets,
            light_nets,
            frozen,
            light_params,
            batch,
            offset=offset,
            axis_name=axis_name,
            use_pallas=use_pallas,
        )
        total = reconst_w * losses["reconst"] + render_w * losses["render"]
        return total, losses

    def step(state: TrainState, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["total"] = total
        return state, metrics

    return step


def make_iiw_train_step(nets: BRDFNets, rank_w: float = 2.0,
                        axis_name: Optional[str] = None):
    """The IIW half of the alternating fine-tune cycle
    (trainFineTuneIIW.py:255-256): loss = rankW*(eq + darker)."""
    from inverserenderingofindoorscene_tpu.pipeline.finetune import iiw_step

    def loss_fn(params, batch):
        _, eq_l, dk_l = iiw_step(nets, params, batch)
        if axis_name is not None:
            eq_l = jax.lax.pmean(eq_l, axis_name)
            dk_l = jax.lax.pmean(dk_l, axis_name)
        return rank_w * (eq_l + dk_l), {"eq": eq_l, "darker": dk_l}

    def step(state: TrainState, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["total"] = total
        return state, metrics

    return step


def make_nyu_train_step(nets: BRDFNets, normal_w: float = 4.5,
                        depth_w: float = 4.5,
                        axis_name: Optional[str] = None):
    """The NYU half of the alternating fine-tune cycle
    (trainFineTuneNYU.py:263): loss = normNYUW*normal + depthNYUW*depth."""
    from inverserenderingofindoorscene_tpu.pipeline.finetune import nyu_step

    def loss_fn(params, batch):
        _, losses = nyu_step(nets, params, batch, axis_name=axis_name)
        return normal_w * losses["normal"] + depth_w * losses["depth"], losses

    def step(state: TrainState, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
        state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["total"] = total
        return state, metrics

    return step


def make_bilateral_train_step(
    brdf_nets: BRDFNets,
    bs_nets: BilateralNets,
    brdf_params,
    albedo_w: float = 1.5,
    rough_w: float = 0.5,
    depth_w: float = 0.5,
    axis_name: Optional[str] = None,
):
    """trainBRDFBilateral.py:264-352: frozen BRDF nets, optimize the three
    confidence CNNs through the bilateral solver's custom VJP."""
    frozen = jax.lax.stop_gradient(brdf_params)

    def loss_fn(bs_params, batch):
        losses, aux = bilateral_step(
            brdf_nets, bs_nets, frozen, bs_params, batch, axis_name=axis_name
        )
        total = bilateral_total_error(losses, albedo_w, rough_w, depth_w)
        # Grid-occupancy maxima: capacity-bucketed callers (vMax/eMax auto)
        # check these against the step's static v_max/e_max for exactness.
        stats = aux["grid_stats"]
        occ = {
            "nvert_max": jnp.max(
                jnp.stack([jnp.max(s["nvert"]) for s in stats.values()])
            ),
            "nedges_max": jnp.max(
                jnp.stack([jnp.max(s["nedges"]) for s in stats.values()])
            ),
        }
        return total, (losses, occ)

    def step(state: TrainState, batch):
        (total, (losses, occ)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        if axis_name is not None:
            grads = jax.lax.psum(grads, axis_name)
            occ = {k: jax.lax.pmax(v, axis_name) for k, v in occ.items()}
        state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["total"] = total
        metrics.update(occ)
        return state, metrics

    return step
