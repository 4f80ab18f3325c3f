"""Evaluation CLI: run detection over a dataset and report VOC AP@0.5.

Rebuild of ref ``test_net.py`` (~230 LoC): load checkpoint -> batched
jitted inference (backbone, RPN, head, per-class NMS all on device) ->
``evaluate_detections`` -> per-class AP + mAP printout, detections
artifact written as JSON (the reference pickles ``detections.pkl``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate Faster R-CNN (TPU)")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--net", default="vgg16",
                   choices=["vgg16", "res50", "res101", "res152", "tiny"])
    p.add_argument("--load_dir", default="models",
                   help="checkpoint root (save_dir of trainval)")
    p.add_argument("--checkpoint_dataset", default=None,
                   help="dataset name used at train time (defaults to "
                        "--dataset)")
    p.add_argument("--checkpoint_step", type=int, default=None)
    p.add_argument("--torch_checkpoint", default=None, metavar="PTH",
                   help="evaluate a reference-trained torch .pth "
                        "directly (full jwyang/SCDA-layout detector "
                        "state dict; converted in-process). Pair with "
                        "--set model.pooling_mode align_legacy for the "
                        "reference RoIAlign semantics")
    p.add_argument("--allow_unsafe_pickle", action="store_true",
                   help="permit full-pickle torch.load for legacy "
                        ".pth files that fail weights_only=True (runs "
                        "arbitrary code from the file — only for "
                        "checkpoints you trust)")
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--use_07_metric", action="store_true")
    p.add_argument("--iou_sweep", action="store_true",
                   help="also report COCO-style mAP@[.5:.95]")
    p.add_argument("--coco_protocol", action="store_true",
                   help="also report the full 12-number COCO summary "
                        "(area ranges, maxDets 1/10/100 — the "
                        "reference's pycocotools eval hooks)")
    p.add_argument("--dets_out", default=None,
                   help="write detections JSON here")
    p.add_argument("--vis", default=None, metavar="DIR",
                   help="write detection overlays for the first images "
                        "(ref test_net.py --vis)")
    p.add_argument("--vis_count", type=int, default=8)
    p.add_argument("--vis_thresh", type=float, default=0.3)
    p.add_argument("--num_devices", type=int, default=0,
                   help="mesh size for sharded eval (0 = all visible "
                        "devices); --bs must be divisible by it")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    p.add_argument("--synth_images", type=int, default=8)
    p.add_argument("--synth_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--synth_fog", type=float, default=0.0,
                   help="fog level of the synthetic val set (the SCDA "
                        "target-domain shift)")
    p.add_argument("--synth_classes", default=None,
                   help="comma-separated class list for the synthetic "
                        "fixture (must match training)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from scda_tpu.cli.trainval import NET_TO_BACKBONE, NET_TO_PRESET
    from scda_tpu.config import (
        PRESETS, _merge_into, apply_overrides, parse_set_list,
        replace_path,
    )

    cfg = PRESETS[NET_TO_PRESET[args.net]]()
    cfg = replace_path(cfg, "model.backbone", NET_TO_BACKBONE[args.net])

    # Self-configure the architecture from the config recorded at train
    # time (trainval writes config.json next to the checkpoints); CLI
    # --set still wins.
    ckpt_ds0 = args.checkpoint_dataset or args.dataset
    cfg_json = os.path.join(args.load_dir, args.net, ckpt_ds0,
                            "config.json")
    state_kind = None
    if os.path.exists(cfg_json):
        with open(cfg_json) as f:
            meta = json.load(f)
        saved = meta["config"]
        state_kind = meta.get("state_kind")
        cfg = _merge_into(cfg, {"model": saved.get("model", {}),
                                "anchors": saved.get("anchors", {})})
        print(f"architecture from {cfg_json}")

    if args.synth_size:
        cfg = replace_path(cfg, "data.image_size", tuple(args.synth_size))
    overrides = parse_set_list(args.set_cfgs)
    if overrides:
        cfg = apply_overrides(cfg, overrides)

    if args.dataset == "synthetic":
        import tempfile

        from scda_tpu.data.synthetic import make_synthetic_dataset

        synth_kw = {}
        suffix = f"_fog{args.synth_fog}" if args.synth_fog else ""
        if args.synth_classes:
            classes = tuple(c.strip() for c in args.synth_classes.split(",")
                            if c.strip())
            synth_kw = {"classes": classes}
            suffix += f"_c{len(classes)}"
        dataset = make_synthetic_dataset(
            os.path.join(tempfile.gettempdir(), f"scda_synth_val{suffix}"),
            num_images=args.synth_images, image_size=cfg.data.image_size,
            seed=100, split="val", fog=args.synth_fog, **synth_kw,
        )
    else:
        from scda_tpu.data.voc import get_dataset

        dataset = get_dataset(args.dataset)

    cfg = replace_path(cfg, "model.num_classes", dataset.num_classes)

    if (cfg.data.auto_canvas and not args.synth_size
            and args.dataset != "synthetic"):
        from scda_tpu.data.pipeline import infer_canvas

        canvas = infer_canvas(dataset.records, cfg.data)
        if canvas != tuple(cfg.data.image_size):
            print(f"canvas {tuple(cfg.data.image_size)} -> {canvas} "
                  f"(from record stats)")
            cfg = replace_path(cfg, "data.image_size", canvas)

    import jax

    from scda_tpu.evals.detect import evaluate_model, run_inference
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.train import checkpoint as ckpt
    from scda_tpu.train.state import create_train_state

    model = build_model(cfg.model, num_anchors=cfg.anchors.num_anchors)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))

    if args.torch_checkpoint:
        from scda_tpu.train.torch_convert import load_reference_checkpoint

        params = load_reference_checkpoint(
            params, args.torch_checkpoint, cfg.model.backbone,
            num_anchors=cfg.anchors.num_anchors,
            allow_unsafe_pickle=args.allow_unsafe_pickle)
        print(f"loaded reference torch checkpoint "
              f"{args.torch_checkpoint}")
        if cfg.model.pooling_mode != "align_legacy":
            print("note: reference checkpoints were trained with the "
                  "legacy RoIAlign; consider --set model.pooling_mode "
                  "align_legacy", file=sys.stderr)
        step = None
    else:
        ckpt_ds = args.checkpoint_dataset or dataset.name
        save_dir = os.path.join(args.load_dir, args.net, ckpt_ds)
        step = ckpt.latest_step(save_dir)
    # --checkpoint_step 0 is a real step; only None means 'latest'.
    shown_step = step if args.checkpoint_step is None else args.checkpoint_step
    if step is not None:
        if state_kind is None:
            # Checkpoints from before the config.json marker: probe the
            # saved tree layout (metadata only, no array reads).  An
            # SCDA state nests the detector under 'det'.  An EMPTY probe
            # means the metadata was unreadable — stay undecided rather
            # than guessing 'det' (a pre-marker SCDA checkpoint would
            # then crash instead of restoring).
            keys = ckpt.checkpoint_top_level_keys(save_dir,
                                                  args.checkpoint_step)
            if keys:
                state_kind = "scda" if "det" in keys else "det"
        template = create_train_state(cfg, params)
        if state_kind is None:
            # Metadata unreadable: try the detector layout, then the
            # SCDA layout, chaining the first error if both fail.
            try:
                restored = ckpt.restore_checkpoint(save_dir, template,
                                                   args.checkpoint_step)
                params = restored.params
                state_kind = "det"
            except Exception as det_err:  # noqa: BLE001 — restore errors
                # span Orbax/asyncio/OS types; any failure here means
                # "not the det layout", so fall through to SCDA (both
                # failing re-raises det_err chained below).
                from scda_tpu.adapt.scda import (
                    create_scda_state, init_discriminator,
                )

                d_model, d_params = init_discriminator(
                    cfg, model, jax.random.key(1))
                scda_template = create_scda_state(cfg, template, d_params)
                try:
                    restored = ckpt.restore_checkpoint(
                        save_dir, scda_template, args.checkpoint_step)
                except Exception as scda_err:  # noqa: BLE001 — same span
                    # Surface BOTH underlying failures: a det-layout
                    # checkpoint failing for a *real* reason (corrupt
                    # array, wrong --set shapes) would otherwise be
                    # reported only as "wrong layout" (r2 advisor).
                    raise RuntimeError(
                        f"checkpoint at {save_dir} matches neither the "
                        "detector nor the SCDA state layout.\n"
                        f"  detector-layout restore error: {det_err!r}\n"
                        f"  SCDA-layout restore error: {scda_err!r}"
                    ) from det_err
                params = restored.det.params
                state_kind = "scda"
            print(f"loaded {state_kind} checkpoint (layout probed by "
                  f"restore) step {shown_step} "
                  f"from {save_dir}")
        elif state_kind == "scda":
            from scda_tpu.adapt.scda import (
                create_scda_state, init_discriminator,
            )

            d_model, d_params = init_discriminator(cfg, model,
                                                   jax.random.key(1))
            template = create_scda_state(cfg, template, d_params)
            restored = ckpt.restore_checkpoint(save_dir, template,
                                               args.checkpoint_step)
            params = restored.det.params
            print(f"loaded SCDA checkpoint step "
                  f"{shown_step} from {save_dir}")
        else:
            restored = ckpt.restore_checkpoint(save_dir, template,
                                               args.checkpoint_step)
            params = restored.params
            print(f"loaded checkpoint step {shown_step} "
                  f"from {save_dir}")
    elif not args.torch_checkpoint:
        print(f"WARNING: no checkpoint under {save_dir}; evaluating "
              f"random init", file=sys.stderr)

    # Sharded eval over the device mesh (the reference's test_net.py ran
    # strictly bs=1 on one GPU; here per-class NMS and postprocess run
    # sharded on device and only fixed-size detections come home).
    from scda_tpu.parallel.mesh import make_mesh, replicate

    cfg = replace_path(cfg, "mesh.num_devices", args.num_devices)
    mesh = make_mesh(cfg.mesh)
    n_dev = mesh.devices.size
    if args.bs % n_dev:
        print(f"--bs {args.bs} not divisible by mesh size {n_dev}",
              file=sys.stderr)
        return 2
    if n_dev > 1:
        params = replicate(mesh, params)
        print(f"eval mesh: {n_dev} device(s)")

    all_dets, ips = run_inference(
        model, params, dataset, cfg, batch_size=args.bs,
        mesh=mesh if n_dev > 1 else None, progress=True,
    )
    from scda_tpu.evals.voc_eval import evaluate_detections

    results = evaluate_detections(dataset, all_dets,
                                  use_07_metric=args.use_07_metric)
    results["images_per_sec"] = ips
    print(json.dumps({"eval": {k: round(float(v), 4)
                               for k, v in results.items()}}))
    for cls in dataset.classes:
        print(f"AP@0.5 {cls:16s} = {results[cls]:.4f}")
    print(f"mAP@0.5 = {results['mAP']:.4f}  "
          f"({results['images_per_sec']:.2f} img/s)")

    if args.iou_sweep:
        from scda_tpu.evals.voc_eval import evaluate_detections_iou_sweep

        sweep = evaluate_detections_iou_sweep(dataset, all_dets)
        print(json.dumps({"iou_sweep": {k: round(float(v), 4)
                                        for k, v in sweep.items()}}))
        print(f"mAP@[.5:.95] = {sweep['mAP@[.5:.95]']:.4f}  "
              f"(mAP@0.75 = {sweep['mAP@0.75']:.4f})")

    if args.coco_protocol:
        from scda_tpu.evals.coco_protocol import evaluate_coco_protocol

        coco = evaluate_coco_protocol(dataset, all_dets)
        print(json.dumps({"coco": {k: round(float(v), 4)
                                   for k, v in coco.items()}}))
        print(f"COCO AP={coco['AP']:.4f} AP50={coco['AP50']:.4f} "
              f"AP75={coco['AP75']:.4f} "
              f"APs/m/l={coco['AP_small']:.3f}/"
              f"{coco['AP_medium']:.3f}/{coco['AP_large']:.3f} "
              f"AR@1/10/100={coco['AR@1']:.3f}/{coco['AR@10']:.3f}/"
              f"{coco['AR@100']:.3f}")

    if args.vis:
        from scda_tpu.cli.demo import draw_detections
        from scda_tpu.data.pipeline import load_image

        os.makedirs(args.vis, exist_ok=True)
        by_image = {}
        for cls, dets in all_dets.items():
            ci = dataset.classes.index(cls) + 1
            for img_id, box, score in dets:
                by_image.setdefault(img_id, []).append((box, score, ci))
        from PIL import Image

        for rec in dataset.records[: args.vis_count]:
            dets = by_image.get(rec.image_id, [])
            boxes = [d[0] for d in dets]
            scores = [d[1] for d in dets]
            cls_ids = [d[2] for d in dets]
            rgb = load_image(rec)[:, :, ::-1]
            out = draw_detections(rgb, boxes, scores, cls_ids,
                                  dataset.classes, args.vis_thresh)
            Image.fromarray(out).save(
                os.path.join(args.vis, f"{rec.image_id}_det.png"))
        print(f"overlays -> {args.vis}")

    if args.dets_out:
        payload = {
            cls: [[img, [float(x) for x in box], float(s)]
                  for img, box, s in dets]
            for cls, dets in all_dets.items()
        }
        with open(args.dets_out, "w") as f:
            json.dump(payload, f)
        print(f"detections -> {args.dets_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
