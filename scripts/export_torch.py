"""Export a trained scda-tpu checkpoint as a reference-layout .pth.

The inverse of ``test_net --torch_checkpoint``: writes the
jwyang/SCDA-lineage ``{'model': state_dict, ...}`` payload the
reference's own ``test_net.py --r`` loads, so a model trained HERE can
be evaluated by the reference codebase (the strongest cross-framework
fidelity check), or handed to a torch user.

Usage:
  python scripts/export_torch.py --load_dir models --net vgg16 \
      --dataset cityscapes_train --out faster_rcnn_export.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--load_dir", default="models")
    p.add_argument("--net", default="vgg16",
                   choices=["vgg16", "res50", "res101", "res152"])
    p.add_argument("--dataset", required=True,
                   help="dataset name used at train time (checkpoint "
                        "subdirectory)")
    p.add_argument("--checkpoint_step", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None,
                   help="override if no config.json marker exists")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import json

    import jax
    import torch

    from scda_tpu.cli.trainval import NET_TO_BACKBONE, NET_TO_PRESET
    from scda_tpu.config import PRESETS, _merge_into, replace_path
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.train import checkpoint as ckpt
    from scda_tpu.train.state import create_train_state
    from scda_tpu.train.torch_convert import export_reference_detector

    cfg = PRESETS[NET_TO_PRESET[args.net]]()
    cfg = replace_path(cfg, "model.backbone", NET_TO_BACKBONE[args.net])
    save_dir = os.path.join(args.load_dir, args.net, args.dataset)
    cfg_json = os.path.join(save_dir, "config.json")
    state_kind = None
    if os.path.exists(cfg_json):
        with open(cfg_json) as f:
            meta = json.load(f)
        cfg = _merge_into(cfg, {"model": meta["config"].get("model", {}),
                                "anchors": meta["config"].get("anchors",
                                                              {})})
        state_kind = meta.get("state_kind")
    if args.num_classes:
        cfg = replace_path(cfg, "model.num_classes", args.num_classes)

    model = build_model(cfg.model, num_anchors=cfg.anchors.num_anchors)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    template = create_train_state(cfg, params)
    if state_kind == "scda":
        from scda_tpu.adapt.scda import create_scda_state, init_discriminator

        d_model, d_params = init_discriminator(cfg, model, jax.random.key(1))
        template = create_scda_state(cfg, template, d_params)
        restored = ckpt.restore_checkpoint(save_dir, template,
                                           args.checkpoint_step)
        params = restored.det.params
        step = int(restored.det.step)
    else:
        restored = ckpt.restore_checkpoint(save_dir, template,
                                           args.checkpoint_step)
        params = restored.params
        step = int(restored.step)

    sd = export_reference_detector(params, cfg.model.backbone,
                                   num_anchors=cfg.anchors.num_anchors)
    payload = {
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
        "session": 1,
        "epoch": 0,
        "step": step,
        "pooling_mode": cfg.model.pooling_mode,
        "class_agnostic": cfg.model.class_agnostic,
    }
    torch.save(payload, args.out)
    print(f"exported step-{step} checkpoint -> {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.0f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
