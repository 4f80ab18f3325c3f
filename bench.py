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
    from scda_tpu.evals.detect import bf16_inference_params
    h, w = cfg.data.image_size
    # Conv/dense param shapes are independent of the canvas; init on a
    # small image to keep the init program's compile cheap.
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    # Serving config: bf16 kernels (test.bf16_weights) — inference is
    # weight-HBM-bound; measured +5% with ~2e-4 score drift (RESULTS.md).
    params = bf16_inference_params(params)

    @jax.jit
    def fn(params, image, im_info):
        return forward_inference(model, params, image, im_info, cfg)

    rng = np.random.RandomState(0)
    im_info = jnp.asarray([[500.0, 1000.0, 0.488]], jnp.float32)

    # Distinct pre-staged inputs; identical inputs + block_until_ready
    # measure nothing on the tunneled runtime (executions overlap and
    # block_until_ready can return before completion).  The device runs
    # executions in order, so fetching a scalar of the LAST output to
    # the host is the completion barrier for the whole queue.
    n_inputs = 8
    images = [
        jax.device_put(
            jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 30))
        for _ in range(n_inputs)
    ]
    jax.block_until_ready(images)

    # Warmup (includes compile; cached on subsequent runs).
    out = fn(params, images[0], im_info)
    np.asarray(out.scores[0, 0:1])

    # Median of 5 repeats — single samples swing ±10% through the
    # tunneled runtime (RESULTS.md), so one draw over-/under-reports.
    iters, repeats = 100, 5
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(params, images[i % n_inputs], im_info)
        np.asarray(out.scores[0, 0:1])  # host fetch = true completion
        samples.append(iters / (time.perf_counter() - t0))
    ips = float(np.median(samples))

    print(json.dumps({
        "metric": "vgg16_fasterrcnn_inference_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 2),
        "spread": [round(min(samples), 2), round(max(samples), 2)],
    }))


if __name__ == "__main__":
    main()
