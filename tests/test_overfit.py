"""End-to-end learning test: overfit 4 synthetic scenes, demand real AP.

This is the rebuild's answer to the reference's only oracle (end-to-end
mAP, SURVEY.md §4) at CI scale: if target assignment, losses, pooling,
NMS, postprocess, or the evaluator are broken in a way unit tests miss,
the detector cannot overfit 4 images and AP stays near 0.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_config
from scda_tpu.data.pipeline import DataLoader
from scda_tpu.data.synthetic import make_memory_dataset
from scda_tpu.evals.detect import evaluate_model
from scda_tpu.models.faster_rcnn import build_model, init_params
from scda_tpu.train.state import create_train_state
from scda_tpu.train.steps import make_train_step


@pytest.mark.slow
def test_overfit_synthetic_reaches_ap(tmp_path):
    cfg = tiny_config()
    # Higher lr for fast overfit; keep every other knob as the tiny cfg.
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=5e-3),
    )
    ds = make_memory_dataset(
        num_images=4, image_size=cfg.data.image_size, max_objects=2,
        seed=7, tmpdir=str(tmp_path),
    )

    model = build_model(cfg.model)
    h, w = cfg.data.image_size
    params = init_params(model, jax.random.key(0), (1, h, w, 3))
    state = create_train_state(cfg, params, steps_per_epoch=10**6)
    step_fn = make_train_step(model, cfg, donate=False)
    loader = DataLoader(ds, cfg.data, batch_size=2, seed=0,
                        augment_flip=False, prefetch=0)
    rng = jax.random.key(42)

    steps = 0
    for batch in loader.repeat():
        state, metrics = step_fn(
            state, jnp.asarray(batch.image), jnp.asarray(batch.im_info),
            jnp.asarray(batch.gt_boxes), jnp.asarray(batch.num_boxes), rng,
        )
        steps += 1
        if steps >= 200:
            break
    assert np.isfinite(float(metrics["loss"]))

    results = evaluate_model(model, state.params, ds, cfg, batch_size=2)
    assert results["mAP"] > 0.3, results
