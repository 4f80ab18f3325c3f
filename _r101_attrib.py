"""res101+ms serving attribution: backbone / +rpn+pool / +head / full."""
import time, numpy as np, jax, jax.numpy as jnp
from scda_tpu.config import get_config, replace_path
from scda_tpu.models.faster_rcnn import (build_model, init_params,
    FasterRCNN, pool_rois_multiscale)
from scda_tpu.models.detector import forward_inference, make_anchors
from scda_tpu.models.rpn import propose
from scda_tpu.evals.detect import bf16_inference_params

cfg = get_config("res101")
cfg = replace_path(cfg, "model.multiscale_roi", True)
cfg = replace_path(cfg, "data.image_size", (512,1024))
cfg = replace_path(cfg, "test.bf16_weights", True)
model = build_model(cfg.model)
params = bf16_inference_params(init_params(model, jax.random.key(0), (1,64,96,3)))

@jax.jit
def bb(params, img):
    f8, f16 = model.apply({"params": params}, img, method=FasterRCNN.features_pyramid)
    return f16

@jax.jit
def bb_pool(params, img, im_info):
    f8, f16 = model.apply({"params": params}, img, method=FasterRCNN.features_pyramid)
    rpn_cls, rpn_bbox = model.apply({"params": params}, f16, method=FasterRCNN.rpn_out)
    anchors = make_anchors(cfg, (f16.shape[1], f16.shape[2]))
    props = propose(rpn_cls, rpn_bbox, anchors, im_info, cfg.test.proposal)
    pooled = pool_rois_multiscale(f8, f16, props.boxes, cfg.model)
    return pooled

@jax.jit
def bb_head(params, img, im_info):
    pooled = None
    f8, f16 = model.apply({"params": params}, img, method=FasterRCNN.features_pyramid)
    rpn_cls, rpn_bbox = model.apply({"params": params}, f16, method=FasterRCNN.rpn_out)
    anchors = make_anchors(cfg, (f16.shape[1], f16.shape[2]))
    props = propose(rpn_cls, rpn_bbox, anchors, im_info, cfg.test.proposal)
    pooled = pool_rois_multiscale(f8, f16, props.boxes, cfg.model)
    cls, box = model.apply({"params": params}, pooled, False, method=FasterRCNN.roi_head)
    return cls

@jax.jit
def full(params, img, im_info):
    return forward_inference(model, params, img, im_info, cfg)

from bench import _structured_batches
raw = _structured_batches(cfg, 8, 1, seed=1)
imgs = [jax.device_put(jnp.asarray(b[0])) for b in raw]
infos = [jax.device_put(jnp.asarray(b[1])) for b in raw]
jax.block_until_ready(imgs)

def timeit(fn, fetch, args_fn, iters=100, reps=5):
    out = fn(*args_fn(0)); np.asarray(fetch(out))
    s=[]
    for _ in range(reps):
        t0=time.perf_counter()
        for i in range(iters): out = fn(*args_fn(i))
        np.asarray(fetch(out))
        s.append(iters/(time.perf_counter()-t0))
    return 1000.0/float(np.median(s))

t1 = timeit(bb, lambda o: o[0,0,0,0:1], lambda i: (params, imgs[i%8]))
t2 = timeit(bb_pool, lambda o: o[0,0,0,0:1], lambda i: (params, imgs[i%8], infos[i%8]))
t3 = timeit(bb_head, lambda o: o[0,0:1], lambda i: (params, imgs[i%8], infos[i%8]))
t4 = timeit(full, lambda o: o.scores[0,0:1], lambda i: (params, imgs[i%8], infos[i%8]))
print(f"backbone(pyramid): {t1:.2f} ms")
print(f"+rpn+propose+mspool: {t2:.2f} ms (delta {t2-t1:.2f})")
print(f"+layer4 head (300 rois): {t3:.2f} ms (delta {t3-t2:.2f})")
print(f"full: {t4:.2f} ms (delta {t4-t3:.2f})")
