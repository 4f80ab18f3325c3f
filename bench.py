"""Benchmark: flagship VGG16 Faster R-CNN inference images/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE.json config #1: single-image VGG16 Faster R-CNN
inference (backbone + RPN + proposal NMS + RoI align + head + per-class
NMS postprocess) on a Cityscapes-sized frame (1024x2048 scaled by the
reference rule to 500x1000 on a 512x1024 canvas).

``vs_baseline`` compares against 5.0 img/s — the upstream
faster-rcnn.pytorch lineage's commonly reported single-image VGG16
inference rate on the paper-era GPU class (Titan X); the reference
publishes no throughput numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

BASELINE_IMG_PER_SEC = 5.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scda_tpu.config import get_config
    from scda_tpu.models.detector import forward_inference
    from scda_tpu.models.faster_rcnn import build_model, init_params

    cfg = get_config("vgg16")
    model = build_model(cfg.model)
    h, w = cfg.data.image_size
    # Conv/dense param shapes are independent of the canvas; init on a
    # small image to keep the init program's compile cheap.
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))

    @jax.jit
    def fn(params, image, im_info):
        return forward_inference(model, params, image, im_info, cfg)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 30)
    im_info = jnp.asarray([[500.0, 1000.0, 0.488]], jnp.float32)

    # Warmup (includes compile; cached on subsequent runs).
    for _ in range(3):
        jax.block_until_ready(fn(params, image, im_info))

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, image, im_info)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    ips = iters / elapsed

    print(json.dumps({
        "metric": "vgg16_fasterrcnn_inference_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
