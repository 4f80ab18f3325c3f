"""Faster R-CNN model assembly (parameters + network forward pieces).

Rebuild of ref lib/model/faster_rcnn/faster_rcnn.py (~160 LoC) +
vgg16.py/resnet.py subclasses.  The reference couples the whole pipeline
(targets, NMS, pooling, losses) inside ``_fasterRCNN.forward``; here the
*module* holds only parameterized network pieces — backbone, RPN head,
RoI head — exposed as methods, and the pipeline lives in
:mod:`scda_tpu.models.detector` as pure functions so the same params work
for train/inference/adaptation variants under jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from scda_tpu.config import ModelConfig
from scda_tpu.models.backbones.resnet import ResNetBackbone, ResNetC4Head
from scda_tpu.models.backbones.vgg import VGG16Backbone, VGG16Head
from scda_tpu.models.rpn import RPNHead
from scda_tpu.ops.roi_ops import (
    roi_align, roi_align_grouped, roi_align_legacy,
    roi_align_legacy_grouped, roi_crop, roi_pool,
)


def _normal_init(stddev: float):
    return nn.initializers.normal(stddev)


def _truncated_init(stddev: float):
    return nn.initializers.truncated_normal(stddev)


class FasterRCNN(nn.Module):
    """Backbone + RPN head + RoI classification head."""

    cfg: ModelConfig
    num_anchors: int = 9

    @property
    def dtype(self) -> Any:
        return (
            jnp.bfloat16
            if self.cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )

    def setup(self):
        c = self.cfg
        if c.backbone == "vgg16":
            self.backbone = VGG16Backbone(dtype=self.dtype,
                                          stem_pallas=c.stem_pallas)
            self.head = VGG16Head(dtype=self.dtype)
        elif c.backbone == "tiny":
            from scda_tpu.models.backbones.tiny import TinyBackbone, TinyHead

            self.backbone = TinyBackbone(dtype=self.dtype)
            self.head = TinyHead(dtype=self.dtype)
        elif c.backbone.startswith("resnet"):
            depth = int(c.backbone.replace("resnet", ""))
            self.backbone = ResNetBackbone(depth=depth, dtype=self.dtype,
                                           chain_pallas=c.bottleneck_pallas)
            self.head = ResNetC4Head(depth=depth, dtype=self.dtype,
                                     matmul=c.head_matmul)
        else:
            raise ValueError(f"unknown backbone {c.backbone!r}")

        self.rpn = RPNHead(
            num_anchors=self.num_anchors,
            channels=c.rpn_channels,
            dtype=self.dtype,
        )
        if c.multiscale_roi:
            # Lateral projection of the stride-8 level to the stride-16
            # channel count so the RoI head is level-agnostic (FPN-style).
            out_ch = {"vgg16": 512, "tiny": 64}.get(c.backbone, 1024)
            self.c3_proj = nn.Conv(
                out_ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                name="c3_proj",
            )
        # Ref _init_weights (faster_rcnn.py:~120): cls 0.01, bbox 0.001.
        init = _truncated_init if c.truncated_init else _normal_init
        self.cls_score = nn.Dense(
            c.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=init(0.01), name="cls_score",
        )
        bbox_out = 4 if c.class_agnostic else 4 * c.num_classes
        self.bbox_pred = nn.Dense(
            bbox_out, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=init(0.001), name="bbox_pred",
        )

    # --- network pieces (each usable via apply(..., method=...)) ---------

    def features(self, image: jnp.ndarray) -> jnp.ndarray:
        """Image (B, H, W, 3) -> base features (B, H/16, W/16, C)."""
        return self.backbone(image)

    def features_pyramid(self, image: jnp.ndarray):
        """Image -> (stride-8, stride-16) feature pair for multi-scale
        RoI pooling (cfg.multiscale_roi).  The stride-8 level is
        lateral-projected here unless cfg.ms_proj_after_pool commutes
        the projection to after pooling (:meth:`pool_multiscale`)."""
        f8, f16 = self.backbone(image, return_pyramid=True)
        if self.cfg.ms_proj_after_pool:
            return f8, f16
        return self.c3_proj(f8), f16

    def pool_multiscale(self, f8_raw: jnp.ndarray, f16: jnp.ndarray,
                        rois: jnp.ndarray) -> jnp.ndarray:
        """Level-assigned RoI align with the lateral projection applied
        AFTER pooling (cfg.ms_proj_after_pool).

        Exact commute of two linear maps: for the 1x1 projection
        (W, b), ``align(proj(f)) = align(f) @ W + b * wsum`` where
        ``wsum[r,p,q] = (sum_h wy[r,p,h]) * (sum_w wx[r,q,w])`` is the
        bilinear weight mass (exactly 1 for interior rois; < 1 where
        border samples drop).  The stride-8 align then contracts at
        C3's raw channel count — its HBM intermediate halves at res101
        scale and the full-map projection pass disappears; the
        pooled-side projection is one (B*R*P*P, C3) x (C3, C) MXU
        matmul."""
        c = self.cfg
        b, r, _ = rois.shape
        pooled8, wsum = pool_fine_raw(f8_raw, rois, c)
        flat = pooled8.reshape((b * r,) + pooled8.shape[2:])
        proj = self.c3_proj(flat)
        proj = proj.reshape((b, r) + proj.shape[1:])
        # The projection bias enters align() scaled by the weight mass,
        # not 1: correct by b * (wsum - 1) (zero for interior rois).
        bias = self.c3_proj(
            jnp.zeros((1, 1, 1, f8_raw.shape[-1]), flat.dtype))[0, 0, 0]
        fine = ((wsum[..., None] - 1.0) * bias.astype(jnp.float32)
                + proj.astype(jnp.float32)).astype(proj.dtype)
        return pool_rois_multiscale(None, f16, rois, c,
                                    fine_override=fine)

    def rpn_out(self, feat: jnp.ndarray):
        return self.rpn(feat)

    def roi_head(self, pooled: jnp.ndarray, train: bool = False):
        """Pooled rois (R, P, P, C) -> (cls_logits (R, C+1),
        bbox_deltas (R, 4 or 4(C+1)))."""
        hidden = self.head(pooled, train=train)
        return (
            self.cls_score(hidden).astype(jnp.float32),
            self.bbox_pred(hidden).astype(jnp.float32),
        )

    def __call__(self, image: jnp.ndarray, train: bool = False):
        """Init/tracing path touching every parameter."""
        if self.cfg.multiscale_roi:
            f8, feat = self.features_pyramid(image)
        else:
            f8, feat = None, self.features(image)
        cls_logits, bbox = self.rpn_out(feat)
        dummy_rois = jnp.tile(
            jnp.asarray([[0.0, 0.0, 64.0, 64.0]], jnp.float32), (2, 1)
        )
        if self.cfg.multiscale_roi and self.cfg.ms_proj_after_pool:
            # c3_proj is applied after pooling in this mode; route the
            # init trace through the same method so it is initialised.
            pooled = self.pool_multiscale(
                f8, feat, jnp.tile(dummy_rois[None], (image.shape[0], 1, 1))
            )
        else:
            pooled = pool_rois(
                feat, dummy_rois, jnp.zeros((2,), jnp.int32), self.cfg
            )
        scores, deltas = self.roi_head(pooled, train=train)
        return feat, cls_logits, bbox, scores, deltas


def _pallas_ok(feat: jnp.ndarray) -> bool:
    """The fused Pallas RoI kernel needs lane-aligned channels (C % 128);
    the 64-channel test backbone silently keeps the einsum path."""
    from scda_tpu.ops.pallas.roi_align_kernel import supported

    return supported(feat.shape[-1])


def pool_rois(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray | None,
    cfg: ModelConfig,
    *,
    output_size: int | None = None,
) -> jnp.ndarray:
    """Dispatch on cfg.pooling_mode (ref faster_rcnn.py:~95: the
    align/pool/crop switch — all three modes implemented).

    ``rois`` may be per-image grouped (B, R, 4) — the fast path: align
    mode then runs as MXU contractions (roi_align_grouped) instead of
    gathers.  Flat (R, 4) + batch_indices is also accepted.  Output is
    always flat (R_total, P, P, C) for the RoI head.
    """
    p = output_size or cfg.pooling_size
    grouped = rois.ndim == 3
    if cfg.pooling_mode == "align_legacy":
        # Reference-lineage crop-and-resize semantics (use when running
        # converted reference checkpoints; see ops/roi_ops.py).
        if grouped:
            if cfg.roi_pallas and _pallas_ok(feat):
                from scda_tpu.ops.pallas.roi_align_kernel import (
                    roi_align_grouped_pallas,
                )

                out = roi_align_grouped_pallas(
                    feat, rois, output_size=p,
                    spatial_scale=1.0 / cfg.feat_stride, legacy=True,
                )
            else:
                out = roi_align_legacy_grouped(
                    feat, rois, output_size=p,
                    spatial_scale=1.0 / cfg.feat_stride,
                )
            return out.reshape((-1,) + out.shape[2:])
        return roi_align_legacy(
            feat, rois, batch_indices, output_size=p,
            spatial_scale=1.0 / cfg.feat_stride,
        )
    if cfg.pooling_mode == "align":
        if grouped:
            if cfg.roi_pallas and _pallas_ok(feat):
                from scda_tpu.ops.pallas.roi_align_kernel import (
                    roi_align_grouped_pallas,
                )

                out = roi_align_grouped_pallas(
                    feat, rois, output_size=p,
                    spatial_scale=1.0 / cfg.feat_stride,
                    sampling_ratio=cfg.sampling_ratio,
                )
            else:
                out = roi_align_grouped(
                    feat, rois,
                    output_size=p,
                    spatial_scale=1.0 / cfg.feat_stride,
                    sampling_ratio=cfg.sampling_ratio,
                )
            return out.reshape((-1,) + out.shape[2:])
        return roi_align(
            feat, rois, batch_indices,
            output_size=p,
            spatial_scale=1.0 / cfg.feat_stride,
            sampling_ratio=cfg.sampling_ratio,
        )
    if cfg.pooling_mode in ("pool", "crop"):
        if grouped:
            b, r, _ = rois.shape
            batch_indices = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
            rois = rois.reshape(b * r, 4)
        op = roi_pool if cfg.pooling_mode == "pool" else roi_crop
        return op(
            feat, rois, batch_indices,
            output_size=p,
            spatial_scale=1.0 / cfg.feat_stride,
        )
    raise ValueError(f"unknown pooling_mode {cfg.pooling_mode!r}")


def pool_rois_multiscale(
    f8: jnp.ndarray | None,  # (B, H/8, W/8, C) lateral-projected
    f16: jnp.ndarray,        # (B, H/16, W/16, C)
    rois: jnp.ndarray,       # (B, R, 4) image coords
    cfg: ModelConfig,
    *,
    output_size: int | None = None,
    fine_override: jnp.ndarray | None = None,  # (B, R, P, P, C)
) -> jnp.ndarray:
    """FPN-style level-assigned RoI align (BASELINE config #5).

    Each roi pools from the level matching its scale: sqrt-area below
    ``ms_fine_threshold`` image pixels -> stride-8 level, else stride 16.
    Both levels are pooled (static shapes) and selected per roi; output
    is flat (B*R, P, P, C) like :func:`pool_rois`.

    ``fine_override`` supplies the pooled fine level directly (the
    proj-after-pool path, :meth:`FasterRCNN.pool_multiscale`); ``f8``
    may then be None.
    """
    p = output_size or cfg.pooling_size
    b, r, _ = rois.shape
    wh = jnp.maximum(rois[..., 2] - rois[..., 0], 0.0) * jnp.maximum(
        rois[..., 3] - rois[..., 1], 0.0
    )
    fine = jnp.sqrt(wh) < cfg.ms_fine_threshold  # (B, R)

    kw = dict(output_size=p, sampling_ratio=cfg.sampling_ratio)
    use_pallas = cfg.roi_pallas and _pallas_ok(f16) and (
        fine_override is not None or _pallas_ok(f8))
    if use_pallas:
        # Opt-in, honestly A/B'd (r3): at res101-ms scale the W-tiled
        # kernel is bit-exact but SLOWER than the reordered einsum
        # (93.5 vs 156.4 img/s) — feature chunks re-stream per roi
        # tile once the map exceeds VMEM.  The einsum default instead
        # contracts the larger axis first with a bf16 intermediate
        # (roi_ops._contract_axis_weights), the measured win
        # (155.8 -> 192.7 img/s).  The kernel remains the right tool
        # when the whole map fits VMEM.
        from scda_tpu.ops.pallas.roi_align_kernel import (
            roi_align_grouped_pallas,
        )

        p16 = roi_align_grouped_pallas(f16, rois,
                                       spatial_scale=1.0 / 16.0, **kw)
        p8 = (fine_override if fine_override is not None else
              roi_align_grouped_pallas(f8, rois, spatial_scale=1.0 / 8.0,
                                       **kw))
    else:
        p16 = roi_align_grouped(f16, rois, spatial_scale=1.0 / 16.0, **kw)
        p8 = (fine_override if fine_override is not None else
              roi_align_grouped(f8, rois, spatial_scale=1.0 / 8.0, **kw))
    out = jnp.where(fine[..., None, None, None], p8, p16)
    return out.reshape((-1,) + out.shape[2:])


def pool_fine_raw(
    f8: jnp.ndarray,        # (B, H/8, W/8, C3) UN-projected stride-8 level
    rois: jnp.ndarray,      # (B, R, 4) image coords
    cfg: ModelConfig,
    *,
    output_size: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stride-8 RoI-align without the lateral projection, plus the
    bilinear weight-mass tensor needed to commute the projection bias
    to after pooling (cfg.ms_proj_after_pool).

    Returns ``(pooled (B, R, P, P, C3), wsum (B, R, P, P) f32)``.
    ``wsum`` is exactly 1 for interior rois; border rois whose samples
    fall outside the map carry the dropped-tap mass.  The duplicate
    axis-weight build between this and :func:`roi_align_grouped` is
    CSE'd by XLA (identical subgraphs).
    """
    from scda_tpu.ops.roi_ops import roi_align_axis_weights

    p = output_size or cfg.pooling_size
    _, h8, w8, _ = f8.shape
    kw = dict(output_size=p, spatial_scale=1.0 / 8.0,
              sampling_ratio=cfg.sampling_ratio)
    wy, wx = roi_align_axis_weights(rois, h8, w8, **kw)
    wsum = wy.sum(-1)[..., :, None] * wx.sum(-1)[..., None, :]
    if cfg.roi_pallas and _pallas_ok(f8):
        from scda_tpu.ops.pallas.roi_align_kernel import (
            roi_align_grouped_pallas,
        )

        pooled = roi_align_grouped_pallas(f8, rois, **kw)
    else:
        pooled = roi_align_grouped(f8, rois, **kw)
    return pooled, wsum


def build_model(cfg: ModelConfig, num_anchors: int = 9) -> FasterRCNN:
    return FasterRCNN(cfg=cfg, num_anchors=num_anchors)


def init_params(
    model: FasterRCNN, rng: jax.Array, image_shape, train: bool = False
):
    """Initialise all parameters with a dummy image."""
    dummy = jnp.zeros(image_shape, jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        dummy, train=train,
    )
    return variables["params"]
