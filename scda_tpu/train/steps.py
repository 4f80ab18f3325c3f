"""Jitted train/eval steps with data-parallel sharding.

The reference's hot loop (ref trainval_net.py:~300-360) launches ~20 CUDA
kernels per step with Python in between; here the entire step — forward,
four losses, backward, optimizer — is ONE XLA program.  Data parallelism
comes from sharding the batch over the ``('data',)`` mesh; XLA inserts
the gradient all-reduce (psum over ICI) automatically because replicated
params meet sharded batch losses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scda_tpu.config import Config
from scda_tpu.models.detector import forward_inference, forward_train
from scda_tpu.models.faster_rcnn import FasterRCNN
from scda_tpu.train.state import TrainState


def check_train_config(cfg: Config) -> None:
    """Reject config combinations that would train incorrectly.

    The fused Pallas stem (``model.stem_pallas``) has no backward kernel
    — it is valid only while conv1/conv2 are frozen (the reference
    freezes them in every config, ref vgg16.py:~50).  With
    ``train.freeze_pretrained_layers=false`` it would silently zero
    their gradients; fail loudly instead (``cli/trainval.py``
    auto-disables the stem and prints a note for CLI users).
    """
    if (cfg.model.stem_pallas and cfg.model.backbone == "vgg16"
            and not cfg.train.freeze_pretrained_layers):
        raise ValueError(
            "model.stem_pallas requires train.freeze_pretrained_layers "
            "(the fused stem produces no conv1/conv2 gradients); set "
            "model.stem_pallas=false to train those layers"
        )


def make_train_step(model: FasterRCNN, cfg: Config,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted supervised train step (configs #1/#2 path)."""
    check_train_config(cfg)

    def step(state: TrainState, image, im_info, gt_boxes, num_boxes,
             base_rng):
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out = forward_train(
                model, params, image, im_info, gt_boxes, num_boxes, cfg, rng
            )
            return out.loss, out.metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model: FasterRCNN, cfg: Config,
                   mesh: Optional[Mesh] = None):
    """Jitted inference step -> fixed-size Detections."""

    def step(params, image, im_info):
        return forward_inference(model, params, image, im_info, cfg)

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data),
        out_shardings=data,
    )
