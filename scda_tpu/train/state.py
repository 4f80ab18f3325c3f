"""Train state + optimizer construction.

Rebuild of the optimizer setup in ref trainval_net.py:~200-240: SGD with
momentum, step lr decay, per-parameter groups (biases get 2x lr and no
weight decay when ``DOUBLE_BIAS``), gradient-norm clipping for VGG16
(ref net_utils.clip_gradient), and frozen layers.  In optax these are a
chain of masked transforms over the param pytree; freezing is a
``set_to_zero`` mask instead of requires_grad mutation, keeping the step
functional.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from scda_tpu.config import Config
from scda_tpu.models.backbones.resnet import resnet_frozen_param_paths
from scda_tpu.models.backbones.vgg import vgg_frozen_param_paths


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def _path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def _mask_from_predicate(params, pred: Callable[[str, Any], bool]):
    flat = flatten_dict(params)
    mask = {k: pred(_path_str(k), v) for k, v in flat.items()}
    return unflatten_dict(mask)


def frozen_paths_for(cfg: Config) -> Sequence[str]:
    if not cfg.train.freeze_pretrained_layers:
        return ()
    if cfg.model.backbone == "vgg16":
        return vgg_frozen_param_paths()
    if cfg.model.backbone.startswith("resnet"):
        return resnet_frozen_param_paths(cfg.model.resnet_fixed_blocks)
    return ()


def _is_frozen(path: str, frozen_prefixes: Sequence[str]) -> bool:
    # Segment-exact prefix match: "backbone/conv2" must freeze conv2's
    # kernel/bias but NOT conv21/conv24/conv28.
    if any(path == p or path.startswith(p + "/") for p in frozen_prefixes):
        return True
    # FrozenBatchNorm statistics/affine params never train
    # (ref resnet.py:~280 eval-mode BN with requires_grad=False).
    parts = path.split("/")
    return any(p.startswith("bn") or p == "downsample_bn" for p in parts)


def _is_bias(path: str, leaf) -> bool:
    return path.endswith("/bias") and getattr(leaf, "ndim", 0) == 1


def make_optimizer(
    cfg: Config,
    params,
    lr_schedule: optax.Schedule | float,
) -> optax.GradientTransformation:
    tc = cfg.train
    frozen_prefixes = frozen_paths_for(cfg)

    decay_mask = _mask_from_predicate(
        params,
        lambda p, v: (
            not _is_frozen(p, frozen_prefixes)
            and (tc.bias_decay or not _is_bias(p, v))
        ),
    )
    bias_mask = _mask_from_predicate(params, _is_bias)
    frozen_mask = _mask_from_predicate(
        params, lambda p, v: _is_frozen(p, frozen_prefixes)
    )

    chain = []
    # Zero frozen-param gradients FIRST (not last): this is the exact
    # analog of the reference's ``requires_grad=False`` — within the one
    # jitted step XLA dead-code-eliminates the entire backward below the
    # last trainable layer (conv1-2 wgrads/dgrads AND the full-res pool1
    # select-and-scatter, ~several ms/img on VGG16), and the global-norm
    # clip then measures trainable grads only, as torch's clip_gradient
    # does (it iterates params with requires_grad).
    chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if tc.clip_gradients and tc.clip_gradients > 0:
        chain.append(optax.clip_by_global_norm(tc.clip_gradients))
    if tc.weight_decay:
        chain.append(
            optax.masked(optax.add_decayed_weights(tc.weight_decay),
                         decay_mask)
        )
    if tc.double_bias:
        chain.append(optax.masked(optax.scale(2.0), bias_mask))
    # Momentum only for trainable params (frozen ones carry no state and
    # no update traffic; their updates are exactly zero from the head of
    # the chain, and sgd-with-momentum maps zero grads to zero updates).
    trainable_mask = jax.tree_util.tree_map(lambda m: not m, frozen_mask)
    acc_dtype = (jnp.bfloat16 if tc.momentum_dtype == "bfloat16" else None)
    chain.append(
        optax.masked(
            optax.sgd(learning_rate=lr_schedule, momentum=tc.momentum,
                      accumulator_dtype=acc_dtype),
            trainable_mask,
        )
    )
    return optax.chain(*chain)


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    """Step decay: lr * gamma every ``lr_decay_step`` epochs
    (ref adjust_learning_rate + --lr_decay_step)."""
    tc = cfg.train
    boundaries = {}
    e = tc.lr_decay_step
    scale = 1.0
    while e <= tc.max_epochs:
        scale *= tc.gamma
        boundaries[e * steps_per_epoch] = tc.gamma
        e += tc.lr_decay_step
    return optax.piecewise_constant_schedule(tc.learning_rate, boundaries)


def create_train_state(
    cfg: Config,
    params,
    steps_per_epoch: int = 1000,
    lr_schedule: Optional[optax.Schedule] = None,
) -> TrainState:
    schedule = lr_schedule or make_lr_schedule(cfg, steps_per_epoch)
    tx = make_optimizer(cfg, params, schedule)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
    )
