"""Train state: params + BN state + optimizer state, and the optimizer itself.

Optimizer parity with the reference (pytorch-sandbox/train.py:99-104):
Adam(lr) for fresh training, SGD(momentum=0.9, nesterov) for fine-tuning.
The learning rate is injected as a runtime hyperparameter so the host-side
ReduceLROnPlateau can change it without recompiling the train step.

``freeze_backbone`` freezes the backbone subtree via optax.multi_transform —
the principled version of the reference's "freeze the first K parameter
tensors" counting hack (pytorch-sandbox/main.py:186-196).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import optax

from hmd_ego_pose_tpu.config import TrainConfig


class TrainState(NamedTuple):
    step: jax.Array
    params: Dict[str, Any]
    bn_state: Dict[str, Any]
    opt_state: Any


def make_optimizer(config: TrainConfig, params) -> optax.GradientTransformation:
    if config.fine_tune:
        inner = optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(
                learning_rate, momentum=config.sgd_momentum, nesterov=True
            )
        )(learning_rate=config.learning_rate)
    else:
        inner = optax.inject_hyperparams(optax.adam)(learning_rate=config.learning_rate)

    if config.clip_grad_norm and config.clip_grad_norm > 0:
        # clip the RAW gradients, then step (the reference's commented-out
        # torch.nn.utils.clip_grad_norm_ placement, train.py:210).  The clip
        # state is optax.EmptyState — checkpointed opt leaves are unchanged.
        inner = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm), inner
        )

    if not config.freeze_backbone:
        return inner

    def label(tree):
        return {k: ("freeze" if k == "backbone" else "train") for k in tree}

    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, label(params)
    )


def create_train_state(params, bn_state, config: TrainConfig) -> TrainState:
    import jax.numpy as jnp

    tx = make_optimizer(config, params)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, bn_state=bn_state, opt_state=opt_state)


def _lr_opt_state(opt, config: TrainConfig):
    """Navigate to the inject_hyperparams state through the optional
    multi_transform (freeze_backbone) and chain (clip_grad_norm) wrappers."""
    if config.freeze_backbone:
        opt = opt.inner_states["train"].inner_state
    if config.clip_grad_norm and config.clip_grad_norm > 0:
        opt = opt[1]  # (clip EmptyState, injected state)
    return opt


def get_learning_rate(state: TrainState, config: TrainConfig) -> float:
    """Read the current injected learning rate out of the optimizer state."""
    return float(_lr_opt_state(state.opt_state, config).hyperparams["learning_rate"])


def set_learning_rate(state: TrainState, config: TrainConfig, lr: float) -> TrainState:
    """Return a new TrainState with the injected learning rate replaced."""
    import jax.numpy as jnp

    def replace(opt):
        if config.clip_grad_norm and config.clip_grad_norm > 0:
            # chain state: (clip EmptyState, injected state, ...)
            inj = opt[1]
            hp = dict(inj.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return (opt[0], inj._replace(hyperparams=hp)) + tuple(opt[2:])
        hp = dict(opt.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt._replace(hyperparams=hp)

    opt = state.opt_state
    if config.freeze_backbone:
        inner = opt.inner_states["train"]
        new_inner = inner._replace(inner_state=replace(inner.inner_state))
        opt = opt._replace(inner_states={**opt.inner_states, "train": new_inner})
    else:
        opt = replace(opt)
    return state._replace(opt_state=opt)
