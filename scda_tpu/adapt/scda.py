"""SCDA adaptation training: region-level adversarial alignment.

Rebuild of the fork's adaptation trainer (SURVEY.md §3.2) as ONE jitted
step: source detection forward (losses), target proposal-only forward,
region mining on both domains, RoI-pooled region patches, and a weighted
adversarial domain loss through a gradient-reversal layer.  The reference
interleaves src/tgt batches and two optimizers across many Python/CUDA
boundaries; here both domains and both parameter sets update in a single
XLA program.

Objective (CVPR'19 eq. 3-5, DANN-style single-loss formulation):
  L = L_det(source) + adv_weight * sum_k w_k * CE(D(GRL(patch_k)), dom_k)
The discriminator parameters descend on CE (learn to tell domains apart);
the detector sees the reversed gradient (learn domain-invariant regions);
``w_k`` weights each group by its proposal count.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scda_tpu.adapt.region_mining import mine_regions
from scda_tpu.config import Config
from scda_tpu.core.grad_reverse import grad_reverse
from scda_tpu.models.detector import forward_train, make_anchors
from scda_tpu.models.discriminator import PatchDiscriminator
from scda_tpu.models.faster_rcnn import FasterRCNN, pool_rois
from scda_tpu.models.rpn import propose
from scda_tpu.train.state import TrainState


class ScdaTrainState(struct.PyTreeNode):
    """Detector train state + discriminator params/optimizer."""

    det: TrainState
    d_params: dict
    d_opt_state: optax.OptState
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def step(self):
        return self.det.step


def create_scda_state(
    cfg: Config, det_state: TrainState, d_params
) -> ScdaTrainState:
    d_tx = optax.sgd(cfg.adapt.d_lr, momentum=cfg.train.momentum)
    return ScdaTrainState(
        det=det_state,
        d_params=d_params,
        d_opt_state=d_tx.init(d_params),
        d_tx=d_tx,
    )


def init_discriminator(cfg: Config, model: FasterRCNN, rng: jax.Array):
    """Build + init the patch discriminator for the backbone's channels."""
    d_model = PatchDiscriminator(channels=cfg.adapt.d_channels)
    c = {"vgg16": 512, "tiny": 64}.get(cfg.model.backbone, 1024)
    dummy = jnp.zeros(
        (2, cfg.adapt.region_pool_size, cfg.adapt.region_pool_size, c),
        jnp.float32,
    )
    d_params = d_model.init(rng, dummy)["params"]
    return d_model, d_params


def _weighted_bce(d_model, d_params, patches, weights, valid, domain):
    """Count-weighted BCE on domain logits (no gradient tricks here)."""
    logits = d_model.apply({"params": d_params}, patches)
    labels = jnp.full(logits.shape, float(domain), jnp.float32)
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    w = jnp.where(valid, weights, 0.0)
    acc = jnp.sum(
        jnp.where(valid, ((logits > 0) == (labels > 0.5)).astype(jnp.float32),
                  0.0)
    ) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-6), acc


def _domain_adv_loss(d_model, d_params, patches, weights, valid, domain,
                     grl_scale):
    """Weighted BCE on domain logits; patches flow through GRL."""
    return _weighted_bce(
        d_model, d_params, grad_reverse(patches, grl_scale),
        weights, valid, domain,
    )


def _scda_parts(
    model: FasterRCNN,
    params,
    src_batch,
    tgt_image,
    tgt_im_info,
    cfg: Config,
    rng: jax.Array,
):
    """Shared forward: source det losses + mined region patches for both
    domains.  Returns (det_out, (patches, weights, valid) x {src, tgt})."""
    ac = cfg.adapt
    rng_det, rng_mine_s, rng_mine_t = jax.random.split(rng, 3)

    src_image, src_info, src_gt, src_num = src_batch
    det_out = forward_train(
        model, params, src_image, src_info, src_gt, src_num, cfg, rng_det
    )

    # Target domain: features + proposals only (no labels).
    feat_t = model.apply({"params": params}, tgt_image,
                         method=FasterRCNN.features)
    rpn_cls_t, rpn_bbox_t = model.apply(
        {"params": params}, feat_t, method=FasterRCNN.rpn_out
    )
    anchors = make_anchors(cfg, (feat_t.shape[1], feat_t.shape[2]))
    # The target tower exists only to feed region mining, which consumes
    # the top ``mining_top_n`` proposals.  Greedy NMS output is
    # prefix-stable (the first K kept boxes don't depend on the output
    # budget), so capping post_nms_top_n at mining_top_n is EXACT while
    # shrinking the NMS loop and every downstream gather.
    import dataclasses as _dc

    tgt_pcfg = _dc.replace(
        cfg.train.proposal,
        post_nms_top_n=min(cfg.train.proposal.post_nms_top_n,
                           max(int(ac.mining_top_n), 1)),
    )
    props_t = propose(rpn_cls_t, rpn_bbox_t, anchors, tgt_im_info,
                      tgt_pcfg)

    # Region mining on both domains.
    mined_s = mine_regions(det_out.proposals.boxes, det_out.proposals.valid,
                           ac, rng_mine_s)
    mined_t = mine_regions(props_t.boxes, props_t.valid, ac, rng_mine_t)

    def pooled_patches(feat, mined):
        b, k, _ = mined.boxes.shape
        patches = pool_rois(
            feat, mined.boxes, None, cfg.model,
            output_size=ac.region_pool_size,
        )
        return (
            patches.astype(jnp.float32),
            mined.weights.reshape(b * k),
            mined.valid.reshape(b * k),
        )

    p_s, w_s, v_s = pooled_patches(det_out.base_feat, mined_s)
    p_t, w_t, v_t = pooled_patches(feat_t, mined_t)
    return det_out, (p_s, w_s, v_s), (p_t, w_t, v_t)


def scda_forward(
    model: FasterRCNN,
    d_model: PatchDiscriminator,
    params,
    d_params,
    src_batch,
    tgt_image,
    tgt_im_info,
    cfg: Config,
    rng: jax.Array,
):
    """Full SCDA loss = source detection + weighted region-adversarial
    (DANN single-loss form: one BCE, gradient reversed into the detector)."""
    ac = cfg.adapt
    det_out, (p_s, w_s, v_s), (p_t, w_t, v_t) = _scda_parts(
        model, params, src_batch, tgt_image, tgt_im_info, cfg, rng
    )

    loss_s, acc_s = _domain_adv_loss(
        d_model, d_params, p_s, w_s, v_s, 1, ac.grl_weight
    )
    loss_t, acc_t = _domain_adv_loss(
        d_model, d_params, p_t, w_t, v_t, 0, ac.grl_weight
    )
    adv = 0.5 * (loss_s + loss_t)

    total = det_out.loss + ac.adv_weight * adv
    metrics = dict(det_out.metrics)
    metrics.update(
        adv=adv, adv_src=loss_s, adv_tgt=loss_t,
        d_acc=0.5 * (acc_s + acc_t), loss=total,
    )
    return total, metrics


def scda_forward_alternating(
    model: FasterRCNN,
    d_model: PatchDiscriminator,
    params,
    d_params,
    src_batch,
    tgt_image,
    tgt_im_info,
    cfg: Config,
    rng: jax.Array,
):
    """GAN-style two-loss SCDA objective (``adapt.d_update=alternating``).

    De-risks the fork's alternating D/G trainer (SURVEY.md §3.2, verify):
      * D loss  — BCE with TRUE domain labels on stop-gradient patches:
        only ``d_params`` receive this gradient.
      * G loss  — BCE with FLIPPED domain labels through a frozen D
        (non-saturating adversarial loss): only the detector receives it.
    One forward pass serves both; both optimizers step from gradients
    taken at the pre-update D, the standard simultaneous-GAN schedule.
    """
    ac = cfg.adapt
    det_out, (p_s, w_s, v_s), (p_t, w_t, v_t) = _scda_parts(
        model, params, src_batch, tgt_image, tgt_im_info, cfg, rng
    )
    sg = jax.lax.stop_gradient

    # Discriminator: learn the true domains on detached patches.
    d_loss_s, acc_s = _weighted_bce(d_model, d_params, sg(p_s), w_s, v_s, 1)
    d_loss_t, acc_t = _weighted_bce(d_model, d_params, sg(p_t), w_t, v_t, 0)
    d_loss = 0.5 * (d_loss_s + d_loss_t)

    # Detector: fool a frozen D — flipped labels (src->0, tgt->1).
    frozen_d = sg(d_params)
    g_loss_s, _ = _weighted_bce(d_model, frozen_d, p_s, w_s, v_s, 0)
    g_loss_t, _ = _weighted_bce(d_model, frozen_d, p_t, w_t, v_t, 1)
    adv = 0.5 * (g_loss_s + g_loss_t)

    # d(total)/d(params)   = det grads + adv_weight * G grads
    # d(total)/d(d_params) = D grads only
    total = det_out.loss + ac.adv_weight * adv + d_loss
    metrics = dict(det_out.metrics)
    metrics.update(
        adv=adv, adv_src=g_loss_s, adv_tgt=g_loss_t, d_loss=d_loss,
        d_acc=0.5 * (acc_s + acc_t),
        # Logged 'loss' excludes d_loss so curves are comparable with
        # the joint schedule (d_loss is exposed separately; r2 advisor).
        loss=det_out.loss + ac.adv_weight * adv,
    )
    return total, metrics


def make_scda_train_step(
    model: FasterRCNN,
    d_model: PatchDiscriminator,
    cfg: Config,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
):
    """Jitted adaptation step updating detector and discriminator.

    ``cfg.adapt.d_update`` selects the objective: "joint" (DANN/GRL) or
    "alternating" (GAN-style true/flipped-label two-loss) — the step
    structure (one forward, two optimizers) is identical either way.
    """
    from scda_tpu.train.steps import check_train_config

    check_train_config(cfg)
    if cfg.adapt.d_update not in ("joint", "alternating"):
        raise ValueError(f"adapt.d_update: {cfg.adapt.d_update!r} "
                         "(want 'joint' or 'alternating')")
    forward = (scda_forward if cfg.adapt.d_update == "joint"
               else scda_forward_alternating)

    def step(state: ScdaTrainState, src_image, src_info, src_gt, src_num,
             tgt_image, tgt_info, base_rng):
        rng = jax.random.fold_in(base_rng, state.det.step)

        def loss_fn(params, d_params):
            return forward(
                model, d_model, params, d_params,
                (src_image, src_info, src_gt, src_num),
                tgt_image, tgt_info, cfg, rng,
            )

        (_, metrics), (g_det, g_d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.det.params, state.d_params)

        new_det = state.det.apply_gradients(g_det)
        d_updates, new_d_opt = state.d_tx.update(
            g_d, state.d_opt_state, state.d_params
        )
        new_d_params = optax.apply_updates(state.d_params, d_updates)
        new_state = state.replace(
            det=new_det, d_params=new_d_params, d_opt_state=new_d_opt
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data, data, data, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
