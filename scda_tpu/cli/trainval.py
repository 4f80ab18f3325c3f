"""Training CLI: source-only Faster R-CNN and SCDA adaptation.

Rebuild of ref ``trainval_net.py`` (~370 LoC) and the fork's adaptation
trainer (SURVEY.md §3.1/3.2).  Flag names mirror the reference where
sensible (--dataset/--net/--bs/--lr/--epochs/--lr_decay_step/--r/
--disp_interval/--save_dir/--use_tfb/--set); the reference's ``--mGPUs``
is replaced by automatic mesh sharding over all visible devices
(``--num_devices`` to restrict).

SCDA mode: pass ``--adapt --target_dataset <name>`` — the second
(unlabeled) dataloader feeds the same jitted step (no interleaved
src/tgt Python loop as in the reference).

Smoke mode: ``--dataset synthetic`` generates the deterministic fixture
dataset on the fly so the full pipeline runs with zero external data.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train Faster R-CNN / SCDA (TPU)")
    p.add_argument("--dataset", default="synthetic",
                   help="registered dataset name, or 'synthetic'")
    p.add_argument("--target_dataset", default=None,
                   help="unlabeled target-domain dataset (SCDA)")
    p.add_argument("--net", default="vgg16",
                   choices=["vgg16", "res50", "res101", "res152", "tiny"])
    p.add_argument("--adapt", action="store_true",
                   help="SCDA adaptation training")
    p.add_argument("--bs", type=int, default=1, help="images per step")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr_decay_step", type=int, default=None)
    p.add_argument("--steps", type=int, default=0,
                   help="cap total steps (0 = epochs * len(loader))")
    p.add_argument("--disp_interval", type=int, default=None)
    p.add_argument("--save_dir", default="models")
    p.add_argument("--checkpoint_interval", type=int, default=0,
                   help="steps between checkpoints (0 = per epoch)")
    p.add_argument("--r", dest="resume", action="store_true",
                   help="resume from latest checkpoint in save_dir")
    p.add_argument("--init_from", default=None, metavar="DIR",
                   help="initialise the detector from a source-only "
                        "checkpoint dir (the SCDA workflow: adapt a "
                        "source-pretrained detector)")
    p.add_argument("--pretrained", default=None,
                   help="torch .pth backbone weights to convert+load")
    p.add_argument("--torch_detector", default=None, metavar="PTH",
                   help="initialise the FULL detector from a "
                        "reference-trained torch .pth (jwyang/SCDA "
                        "layout) — e.g. adapt from a reference "
                        "source-only checkpoint")
    p.add_argument("--allow_unsafe_pickle", action="store_true",
                   help="permit full-pickle torch.load for legacy "
                        ".pth files that fail weights_only=True (runs "
                        "arbitrary code from the file — only for "
                        "checkpoints you trust)")
    p.add_argument("--num_devices", type=int, default=0,
                   help="mesh size (0 = all visible devices)")
    p.add_argument("--use_tfb", action="store_true",
                   help="also write TensorBoard summaries")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--cfg_file", default=None,
                   help="YAML config overlay (ref cfg_from_file)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of steps 3-8 "
                        "into DIR (view with tensorboard)")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[],
                   help="config overrides: dotted.path value ...")
    # Synthetic-mode knobs.
    p.add_argument("--synth_images", type=int, default=16)
    p.add_argument("--synth_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--synth_src_size", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="scene size of the SOURCE fixture only (e.g. a "
                        "KITTI-aspect source vs a Cityscapes-aspect "
                        "canvas/target, paper Table 3 protocol); default "
                        "= the canvas size")
    p.add_argument("--synth_fog", type=float, default=0.5,
                   help="fog level of the synthetic_foggy fixture target")
    p.add_argument("--synth_classes", default=None,
                   help="comma-separated class list for the synthetic "
                        "fixture (e.g. 'car' for the car-only SIM10k-style "
                        "protocol, BASELINE config #4)")
    return p.parse_args(argv)


NET_TO_PRESET = {"vgg16": "vgg16", "res50": "res50", "res101": "res101",
                 "res152": "res152", "tiny": "vgg16"}
NET_TO_BACKBONE = {"vgg16": "vgg16", "res50": "resnet50",
                   "res101": "resnet101", "res152": "resnet152",
                   "tiny": "tiny"}


def build_config(args):
    from scda_tpu.config import (
        PRESETS, apply_overrides, config_from_yaml, parse_set_list,
        replace_path,
    )

    cfg = PRESETS[NET_TO_PRESET[args.net]]()
    cfg = replace_path(cfg, "model.backbone", NET_TO_BACKBONE[args.net])
    if args.cfg_file:
        cfg = config_from_yaml(args.cfg_file, base=cfg)
        if cfg.adapt.enabled:
            args.adapt = True
    if args.lr is not None:
        cfg = replace_path(cfg, "train.learning_rate", args.lr)
    if args.epochs is not None:
        cfg = replace_path(cfg, "train.max_epochs", args.epochs)
    if args.lr_decay_step is not None:
        cfg = replace_path(cfg, "train.lr_decay_step", args.lr_decay_step)
    if args.disp_interval is not None:
        cfg = replace_path(cfg, "train.disp_interval", args.disp_interval)
    cfg = replace_path(cfg, "train.batch_size", args.bs)
    cfg = replace_path(cfg, "train.seed", args.seed)
    cfg = replace_path(cfg, "mesh.num_devices", args.num_devices)
    if args.adapt:
        cfg = replace_path(cfg, "adapt.enabled", True)
    if args.synth_size:
        cfg = replace_path(cfg, "data.image_size", tuple(args.synth_size))
    overrides = parse_set_list(args.set_cfgs)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if (cfg.model.stem_pallas and cfg.model.backbone == "vgg16"
            and not cfg.train.freeze_pretrained_layers):
        # The fused stem has no backward kernel (it relies on conv1/conv2
        # being frozen); with freezing off it must not run or those
        # layers would silently never train (train/steps.py raises for
        # library users — the CLI auto-disables instead).
        print("note: model.stem_pallas disabled "
              "(train.freeze_pretrained_layers=false needs conv1/conv2 "
              "gradients, which the fused stem does not produce)")
        cfg = replace_path(cfg, "model.stem_pallas", False)
    return cfg


def get_datasets(args, cfg):
    from scda_tpu.data.voc import get_dataset

    synth_kw = {}
    if getattr(args, "synth_classes", None):
        classes = tuple(c.strip() for c in args.synth_classes.split(",")
                        if c.strip())
        synth_kw = {"classes": classes}

    def resolve(name):
        # "dir:<path>" = images-only folder (the unlabeled SCDA target
        # domain needs no annotations).
        if name.startswith("dir:"):
            from scda_tpu.data.voc import load_image_dir_dataset

            return load_image_dir_dataset(name[4:],
                                          name=os.path.basename(name[4:]))
        if name == "synthetic":
            import tempfile

            from scda_tpu.data.synthetic import make_synthetic_dataset

            src_size = (tuple(args.synth_src_size)
                        if getattr(args, "synth_src_size", None)
                        else cfg.data.image_size)
            suffix = f"_c{len(synth_kw['classes'])}" if synth_kw else ""
            if src_size != tuple(cfg.data.image_size):
                suffix += f"_s{src_size[0]}x{src_size[1]}"
            return make_synthetic_dataset(
                os.path.join(tempfile.gettempdir(),
                             f"scda_synth_train{suffix}"),
                num_images=args.synth_images,
                image_size=src_size, seed=0, split="train",
                **synth_kw,
            )
        if name == "synthetic_foggy":
            import tempfile

            from scda_tpu.data.synthetic import make_synthetic_dataset

            suffix = f"_c{len(synth_kw['classes'])}" if synth_kw else ""
            return make_synthetic_dataset(
                os.path.join(tempfile.gettempdir(),
                             f"scda_synth_tgt_fog{args.synth_fog}{suffix}"),
                num_images=args.synth_images,
                image_size=cfg.data.image_size, seed=1, split="train",
                fog=args.synth_fog, name="synthetic_foggy", **synth_kw,
            )
        return get_dataset(name)

    src = resolve(args.dataset)
    tgt_name = args.target_dataset
    if tgt_name is None and args.adapt and args.dataset == "synthetic":
        tgt_name = "synthetic_foggy"  # fixture target for smoke runs
    tgt = resolve(tgt_name) if tgt_name else None
    return src, tgt


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = build_config(args)

    import jax
    import jax.numpy as jnp

    from scda_tpu.config import replace_path
    from scda_tpu.data.pipeline import DataLoader
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from scda_tpu.train import checkpoint as ckpt
    from scda_tpu.train.state import create_train_state
    from scda_tpu.train.steps import make_train_step
    from scda_tpu.utils.logging import MetricsLogger

    src_ds, tgt_ds = get_datasets(args, cfg)
    num_classes = src_ds.num_classes
    cfg = replace_path(cfg, "model.num_classes", num_classes)

    # Derive the canvas from the records so the reference scale rule
    # (shorter side 600, cap 1000) holds for every image — synthetic
    # fixtures keep their explicit size.
    if (cfg.data.auto_canvas and not args.synth_size
            and not args.dataset.startswith("synthetic")):
        from scda_tpu.data.pipeline import infer_canvas

        recs = list(src_ds.records) + (
            list(tgt_ds.records) if tgt_ds is not None else [])
        canvas = infer_canvas(recs, cfg.data)
        if canvas != tuple(cfg.data.image_size):
            print(f"canvas {tuple(cfg.data.image_size)} -> {canvas} "
                  f"(from record stats)")
            cfg = replace_path(cfg, "data.image_size", canvas)
    if args.adapt and tgt_ds is None:
        print("--adapt requires --target_dataset (or synthetic)",
              file=sys.stderr)
        return 2

    mesh = make_mesh(cfg.mesh)
    n_dev = mesh.devices.size
    if args.bs % n_dev:
        print(f"batch size {args.bs} not divisible by mesh size {n_dev}",
              file=sys.stderr)
        return 2

    print(f"dataset={src_ds.name} ({len(src_ds)} images, "
          f"{num_classes - 1} fg classes), net={args.net}, "
          f"mesh={n_dev} device(s), adapt={args.adapt}")

    model = build_model(cfg.model, num_anchors=cfg.anchors.num_anchors)
    params = init_params(model, jax.random.key(cfg.train.seed), (1, 64, 96, 3))
    if args.pretrained:
        from scda_tpu.train.torch_convert import load_pretrained_backbone

        params = load_pretrained_backbone(
            params, args.pretrained, cfg.model.backbone,
            allow_unsafe_pickle=args.allow_unsafe_pickle)
        print(f"loaded pretrained backbone from {args.pretrained}")
    if args.torch_detector:
        from scda_tpu.train.torch_convert import load_reference_checkpoint

        params = load_reference_checkpoint(
            params, args.torch_detector, cfg.model.backbone,
            num_anchors=cfg.anchors.num_anchors,
            allow_unsafe_pickle=args.allow_unsafe_pickle)
        print(f"initialised full detector from reference checkpoint "
              f"{args.torch_detector}")

    loader = DataLoader(src_ds, cfg.data, args.bs, seed=cfg.train.seed)
    steps_per_epoch = len(loader)
    total_steps = args.steps or steps_per_epoch * cfg.train.max_epochs

    det_state = create_train_state(cfg, params, steps_per_epoch)
    if args.init_from:
        det_state = ckpt.restore_checkpoint(args.init_from, det_state)
        # Adaptation starts its own step count (fresh schedule).
        det_state = det_state.replace(step=jnp.zeros((), jnp.int32))
        print(f"detector initialised from {args.init_from}")

    if args.adapt:
        from scda_tpu.adapt.scda import (
            create_scda_state, init_discriminator, make_scda_train_step,
        )

        d_model, d_params = init_discriminator(
            cfg, model, jax.random.key(cfg.train.seed + 1))
        state = create_scda_state(cfg, det_state, d_params)
        step_fn = make_scda_train_step(model, d_model, cfg, mesh=mesh)
        tgt_loader = DataLoader(tgt_ds, cfg.data, args.bs,
                                seed=cfg.train.seed + 7)
        tgt_iter = iter(tgt_loader.repeat())
    else:
        state = det_state
        step_fn = make_train_step(model, cfg, mesh=mesh)
        tgt_iter = None

    save_dir = os.path.join(args.save_dir, args.net, src_ds.name)
    # Record the config + class list next to the checkpoints so eval and
    # demo self-configure (exceeds the reference, which pickled only
    # pooling_mode/class_agnostic into the checkpoint).
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        import dataclasses as _dc
        import json as _json

        _json.dump({"config": _dc.asdict(cfg),
                    "classes": list(src_ds.classes),
                    # Checkpoint layout marker: eval uses this to build
                    # the right restore template (SCDA nests the
                    # detector state under .det).
                    "state_kind": "scda" if args.adapt else "det"}, f,
                   indent=1)
    if args.resume:
        step0 = ckpt.latest_step(save_dir)
        if step0 is not None:
            state = ckpt.restore_checkpoint(save_dir, state)
            print(f"resumed from step {step0}")

    state = replicate(mesh, state)
    base_rng = replicate(mesh, jax.random.key(cfg.train.seed))

    logger = MetricsLogger(
        log_file=os.path.join(save_dir, "metrics.jsonl")
        if args.save_dir else None,
        tensorboard_dir=os.path.join(save_dir, "tb") if args.use_tfb
        else None,
    )
    ckpt_every = args.checkpoint_interval or steps_per_epoch

    step = int(jax.device_get(state.step))
    start_step = step
    done = False
    # Steps are dispatched async; throughput is measured over each display
    # window, where the metrics fetch forces a device sync.
    win_t0 = time.perf_counter()
    win_step0 = step
    t_train0, first_sync_step = None, None
    while not done:
        for batch in loader:
            if step >= total_steps:
                done = True
                break
            sb = shard_batch(mesh, (batch.image, batch.im_info,
                                    batch.gt_boxes, batch.num_boxes))
            if args.adapt:
                tb = next(tgt_iter)
                tgt_sb = shard_batch(mesh, (tb.image, tb.im_info))
                state, metrics = step_fn(state, *sb, *tgt_sb, base_rng)
            else:
                state, metrics = step_fn(state, *sb, base_rng)
            step += 1
            # Profiler window: steps 3-8 after compile (SURVEY.md §5 —
            # the reference had only wall-clock prints).
            if args.profile and step == 3:
                jax.profiler.start_trace(args.profile)
            if args.profile and step == 8:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace -> {args.profile}", flush=True)
                args.profile = None
            if step % cfg.train.disp_interval == 0 or step == 1:
                m = {k: float(v) for k, v in
                     jax.device_get(metrics).items()}  # <- sync point
                now = time.perf_counter()
                if step > win_step0:
                    m["img_per_sec"] = (
                        (step - win_step0) * args.bs / (now - win_t0)
                    )
                win_t0, win_step0 = now, step
                if t_train0 is None:
                    # Exclude the compile (first sync) from the average.
                    t_train0, first_sync_step = now, step
                logger.log(step, m)
            if step % ckpt_every == 0 or step == total_steps:
                path = ckpt.save_checkpoint(save_dir, state, step)
                print(f"checkpoint -> {path}", flush=True)
    jax.block_until_ready(state.step)
    ckpt.wait_for_saves()  # async writes must be durable before exit
    logger.close()
    if t_train0 is not None and step > first_sync_step:
        avg = (step - first_sync_step) * args.bs / (
            time.perf_counter() - t_train0)
        print(f"done: {step - start_step} steps, avg {avg:.2f} img/s "
              f"(excl. compile)")
    else:
        print(f"done: {step - start_step} steps")
    return 0


if __name__ == "__main__":
    sys.exit(main())
