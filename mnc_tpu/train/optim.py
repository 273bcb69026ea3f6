"""Solver: SGD + momentum + step LR + weight decay + grad accumulation.

≙ the reference Caffe solver (``caffe-mnc/src/caffe/solver.cpp`` /
``sgd_solvers.cpp`` + ``models/VGG16/mnc_5stage/solver.prototxt``): base lr
0.001, momentum 0.9, weight decay 0.0005, ``lr_policy: step`` (×0.1 every
STEPSIZE iters), ``iter_size`` gradient accumulation.  Caffe layer rules are
preserved: weight decay applies to kernels only and biases get 2× learning
rate (the prototxt's ``lr_mult: 2, decay_mult: 0`` convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def step_lr(base_lr: float, gamma: float, stepsize: int) -> optax.Schedule:
    """Caffe ``step`` policy: lr = base * gamma^(floor(it/stepsize))."""

    def schedule(count):
        return base_lr * gamma ** jnp.floor_divide(count, stepsize)

    return schedule


def _is_bias(path) -> bool:
    last = path[-1]
    name = getattr(last, "key", getattr(last, "name", str(last)))
    return "bias" in str(name)


def bias_mask(params, bias_value: bool):
    return jax.tree_util.tree_map_with_path(
        lambda p, _: bias_value if _is_bias(p) else not bias_value, params
    )


def make_optimizer(
    params,
    base_lr: float = 0.001,
    momentum: float = 0.9,
    weight_decay: float = 0.0005,
    gamma: float = 0.1,
    stepsize: int = 20000,
    iter_size: int = 1,
    caffe_bias_rules: bool = True,
    clip_gradients: float = -1.0,
) -> optax.GradientTransformation:
    schedule = step_lr(base_lr, gamma, stepsize)
    chain = []
    if clip_gradients and clip_gradients > 0:
        # Caffe solver clip_gradients: scale grads when global norm exceeds it
        chain.append(optax.clip_by_global_norm(clip_gradients))
    if weight_decay:
        mask = bias_mask(params, False) if caffe_bias_rules else None
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if caffe_bias_rules:
        # biases: 2x lr (Caffe lr_mult: 2), implemented as a grad scale
        bmask = bias_mask(params, True)
        chain.append(
            optax.masked(optax.scale(2.0), bmask)
        )
    chain.append(optax.sgd(learning_rate=schedule, momentum=momentum))
    tx = optax.chain(*chain)
    if iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=iter_size)
    return tx
