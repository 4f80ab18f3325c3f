"""Demo CLI: folder inference + detection overlays.

Rebuild of ref ``demo.py`` (~370 LoC): load a checkpoint, run detection
on every image in a folder, draw class/score overlays
(ref net_utils.vis_detections) and save ``*_det.png`` next to the inputs
(or under --out_dir).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Detection demo (TPU)")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--net", default="vgg16",
                   choices=["vgg16", "res50", "res101", "res152", "tiny"])
    p.add_argument("--load_dir", default="models")
    p.add_argument("--checkpoint_dataset", default="synthetic")
    p.add_argument("--classes", nargs="*", default=None,
                   help="fg class names (default: cityscapes 8)")
    p.add_argument("--thresh", type=float, default=0.5)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    return p.parse_args(argv)


_PALETTE = [
    (255, 60, 60), (60, 200, 80), (70, 110, 255), (240, 200, 40),
    (200, 80, 220), (50, 210, 210), (250, 140, 40), (150, 150, 150),
]


def draw_detections(img_rgb: np.ndarray, boxes, scores, classes, names,
                    thresh: float):
    """PIL overlay (ref vis_detections, net_utils.py:~120)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(img_rgb.astype(np.uint8))
    dr = ImageDraw.Draw(im)
    for box, score, cls in zip(boxes, scores, classes):
        if score < thresh:
            continue
        color = _PALETTE[(int(cls) - 1) % len(_PALETTE)]
        x1, y1, x2, y2 = [float(v) for v in box]
        dr.rectangle([x1, y1, x2, y2], outline=color, width=2)
        label = f"{names[int(cls) - 1]} {score:.2f}"
        dr.text((x1 + 2, max(y1 - 12, 0)), label, fill=color)
    return np.asarray(im)


def main(argv=None) -> int:
    args = parse_args(argv)

    from scda_tpu.cli.trainval import NET_TO_BACKBONE, NET_TO_PRESET
    from scda_tpu.config import (
        PRESETS, apply_overrides, parse_set_list, replace_path,
    )
    from scda_tpu.data.voc import CITYSCAPES_CLASSES

    classes = tuple(args.classes) if args.classes else CITYSCAPES_CLASSES
    cfg = PRESETS[NET_TO_PRESET[args.net]]()
    cfg = replace_path(cfg, "model.backbone", NET_TO_BACKBONE[args.net])
    cfg = replace_path(cfg, "model.num_classes", len(classes) + 1)
    overrides = parse_set_list(args.set_cfgs)
    if overrides:
        cfg = apply_overrides(cfg, overrides)

    import jax
    import jax.numpy as jnp

    from scda_tpu.data.pipeline import load_image, prepare_image
    from scda_tpu.models.detector import forward_inference
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.train import checkpoint as ckpt
    from scda_tpu.train.state import create_train_state

    model = build_model(cfg.model, num_anchors=cfg.anchors.num_anchors)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    save_dir = os.path.join(args.load_dir, args.net,
                            args.checkpoint_dataset)
    step = ckpt.latest_step(save_dir)
    if step is not None:
        template = create_train_state(cfg, params)
        params = ckpt.restore_checkpoint(save_dir, template).params
        print(f"loaded checkpoint step {step} from {save_dir}")
    else:
        print(f"WARNING: no checkpoint under {save_dir}; random weights",
              file=sys.stderr)

    @jax.jit
    def infer(params, image, im_info):
        return forward_inference(model, params, image, im_info, cfg)

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    files = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith(exts) and not f.endswith("_det.png")
    )
    if not files:
        print(f"no images in {args.image_dir}", file=sys.stderr)
        return 1
    out_dir = args.out_dir or args.image_dir
    os.makedirs(out_dir, exist_ok=True)

    class _Rec:
        pass

    for fname in files:
        rec = _Rec()
        rec.image_path = os.path.join(args.image_dir, fname)
        img_bgr = load_image(rec)
        canvas, scale, (vh, vw) = prepare_image(img_bgr, cfg.data)
        im_info = jnp.asarray([[vh, vw, scale]], jnp.float32)
        dets = jax.device_get(
            infer(params, jnp.asarray(canvas[None]), im_info)
        )
        v = dets.valid[0]
        rgb = img_bgr[:, :, ::-1] if img_bgr.ndim == 3 else img_bgr
        out = draw_detections(
            rgb, dets.boxes[0][v], dets.scores[0][v], dets.classes[0][v],
            classes, args.thresh,
        )
        from PIL import Image

        out_path = os.path.join(
            out_dir, os.path.splitext(fname)[0] + "_det.png")
        Image.fromarray(out).save(out_path)
        n = int((dets.scores[0][v] >= args.thresh).sum())
        print(f"{fname}: {n} detections >= {args.thresh} -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
