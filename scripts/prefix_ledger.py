"""Cumulative-prefix serving ledger on the chip (r3 VERDICT items #3/#6).

Times successively longer prefixes of ``forward_inference`` as separate
jitted programs — backbone, +RPN heads, +proposal NMS, +RoI pool & head,
full postprocess — so the difference between consecutive stages
attributes every serving millisecond.  Caveat (documented in RESULTS):
stage deltas measured this way are an UPPER bound on the marginal cost —
XLA overlaps independent work across stage boundaries inside the full
program, so deltas can even be negative when a stage hides entirely
under its predecessor.

Run:  python scripts/prefix_ledger.py [vgg16|res101_ms] [batch_size]
Protocol: distinct pre-staged inputs, host fetch of a scalar from the
last output as the completion barrier, median of 5 repeats.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(which: str, batch_size: int):
    import jax
    import jax.numpy as jnp

    from bench import _serving_cfg, _structured_batches
    from scda_tpu.evals.detect import bf16_inference_params
    from scda_tpu.models.detector import forward_inference, make_anchors
    from scda_tpu.models.faster_rcnn import (
        FasterRCNN, build_model, init_params, pool_rois,
        pool_rois_multiscale,
    )
    from scda_tpu.models.rpn import propose

    if which == "res101_ms":
        cfg = _serving_cfg("res101", multiscale_roi=True)
    else:
        cfg = _serving_cfg("vgg16")
    mc, tc = cfg.model, cfg.test
    model = build_model(cfg.model)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    params = bf16_inference_params(params)

    def backbone(params, image):
        if mc.multiscale_roi:
            f8, feat = model.apply({"params": params}, image,
                                   method=FasterRCNN.features_pyramid)
            return f8, feat
        return None, model.apply({"params": params}, image,
                                 method=FasterRCNN.features)

    # NOTE: in the multiscale prefixes the stride-8 lateral feature is
    # DCE'd until the pooling stage uses it — its cost lands in "pool+head".
    def p1_feat(params, image, im_info):
        _, feat = backbone(params, image)
        return feat.sum()

    def p2_rpn(params, image, im_info):
        _, feat = backbone(params, image)
        rpn_cls, rpn_bbox = model.apply({"params": params}, feat,
                                        method=FasterRCNN.rpn_out)
        return rpn_cls.sum() + rpn_bbox.sum()

    def _props(params, feat, im_info):
        rpn_cls, rpn_bbox = model.apply({"params": params}, feat,
                                        method=FasterRCNN.rpn_out)
        anchors = make_anchors(cfg, (feat.shape[1], feat.shape[2]))
        return propose(rpn_cls, rpn_bbox, anchors, im_info, tc.proposal)

    def p3_propose(params, image, im_info):
        _, feat = backbone(params, image)
        props = _props(params, feat, im_info)
        return props.boxes.sum() + props.valid.sum()

    def p4_head(params, image, im_info):
        f8, feat = backbone(params, image)
        props = _props(params, feat, im_info)
        if mc.multiscale_roi:
            from scda_tpu.models.detector import _pool_ms

            pooled = _pool_ms(model, params, f8, feat, props.boxes, mc)
        else:
            pooled = pool_rois(feat, props.boxes, None, mc)
        cls_logits, bbox_deltas = model.apply(
            {"params": params}, pooled, False, method=FasterRCNN.roi_head)
        return cls_logits.sum() + bbox_deltas.sum()

    def p5_full(params, image, im_info):
        out = forward_inference(model, params, image, im_info, cfg)
        return out.scores.sum() + out.boxes.sum()

    stages = [("backbone", p1_feat), ("rpn_heads", p2_rpn),
              ("proposal_nms", p3_propose), ("pool_head", p4_head),
              ("full_postprocess", p5_full)]

    raw = _structured_batches(cfg, 8, batch_size, seed=1)
    images = [jax.device_put(jnp.asarray(b[0])) for b in raw]
    infos = [jax.device_put(jnp.asarray(b[1])) for b in raw]
    jax.block_until_ready(images)
    return stages, params, images, infos


def time_stage(fn, params, images, infos, iters=50, repeats=5):
    import jax

    jf = jax.jit(fn)
    t0 = time.perf_counter()
    float(jf(params, images[0], infos[0]))   # compile + warmup
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = jf(params, images[i % len(images)], infos[i % len(infos)])
        float(out)                            # host fetch = barrier
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(samples)), compile_s


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "vgg16"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    stages, params, images, infos = build(which, bs)
    prev = 0.0
    rows = []
    for name, fn in stages:
        ms, comp = time_stage(fn, params, images, infos)
        rows.append({"stage": name, "cum_ms": round(ms, 3),
                     "delta_ms": round(ms - prev, 3)})
        print(f"# {which} bs={bs} {name}: cum {ms:.3f} ms "
              f"(+{ms - prev:.3f}) [compile {comp:.0f}s]", flush=True)
        prev = ms
    print(json.dumps({"model": which, "batch_size": bs, "ledger": rows}),
          flush=True)


if __name__ == "__main__":
    main()
