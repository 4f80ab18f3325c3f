"""Benchmark: all five BASELINE.json configs on one chip.

Outage-proof capture protocol (r3 VERDICT missing #1 — a relay flap at
round end must never cost the whole perf record again):

  1. The HEADLINE config runs FIRST and prints immediately (marked
     ``"provisional": true``), so a crash one config in still leaves a
     real headline number on stdout.
  2. After EVERY subsequent config, the headline line is re-emitted
     with the accumulated per-config ``configs`` table — the driver
     records the LAST line, so at any crash point the last complete
     line is a valid headline record carrying everything measured so
     far.  The final line (all configs done) drops the provisional
     flag.
  3. Each completed config is also persisted atomically to
     ``bench_partial.json`` next to this file.
  4. Preflight retries: the backend probe re-runs every
     ``SCDA_BENCH_PREFLIGHT_PROBE_S`` (60 s) until
     ``SCDA_BENCH_PREFLIGHT_S`` (900 s) elapses, instead of one
     all-or-nothing 600 s shot.

Configs (BASELINE.json `configs`, RESULTS.md table):
  inference_bs1  #1  VGG16 Faster R-CNN serving, bs=1   (headline)
  inference_bs8  #1' VGG16 serving, bs=8
  train_bs1      #2  source-only train step, bs=1
  train_bs8      #2' source-only train step, bs=8
  train_bs16     #2'' train step, bs=16 (per-chip optimum after the
                 fused stem removed the r2 bs=16 working-set cliff)
  scda_bs1       #3  SCDA adaptation step (joint/GRL), bs=1
  scda_bs8       #3' SCDA adaptation step, bs=8 (production batch —
                 amortizes the bs=1 latency floor like train_bs8 does)
  scda_car       #4  car-only SCDA (class-agnostic, alternating D/G)
  scda_car_bs8   #4' car-only SCDA, bs=8 (honest per-chip number for
                 the alternating path; bs=1 is a latency-floor artifact)
  res101_ms      #5  ResNet-101 + multi-scale RoI align, inference bs=1
  res101_bs8     #5' same model, bs=8 serving

Inputs are STRUCTURED fixture scenes (colored-rectangle Cityscapes-size
frames through the real prep pipeline), not Gaussian noise — proposal
NMS cost depends on the score distribution (r2 VERDICT weak #2).

``vs_baseline`` divides by reference-class paper-era GPU estimates
(the reference publishes no throughput numbers — BASELINE.md): 5.0
img/s single-image VGG16 inference (upstream faster-rcnn.pytorch
lineage on Titan X class), 2.5 img/s bs=1 training, 1.5 img/s SCDA
(two towers + D), 4.0 img/s ResNet-101 inference.

Timing: distinct pre-staged inputs; a host fetch of a scalar from the
LAST output is the completion barrier (the tunneled runtime executes
in order; block_until_ready alone can return early).  Median of
``repeats`` samples with spread.

Env knobs:
  SCDA_BENCH_CONFIGS  comma list to subset (default: all)
  SCDA_BENCH_QUICK=1  quarter iteration counts (smoke)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

HEADLINE = "inference_bs1"
HEADLINE_METRIC = "vgg16_fasterrcnn_inference_images_per_sec_per_chip"

# bf16 peak of the bench chip for the MFU denominator (v5e: 197 TFLOP/s).
PEAK_TFLOPS = float(os.environ.get("SCDA_PEAK_TFLOPS", "197"))

BASELINES_IMG_PER_SEC = {
    "inference_bs1": 5.0,
    "inference_bs8": 5.0,
    "train_bs1": 2.5,
    "train_bs8": 2.5,
    "train_bs16": 2.5,
    "scda_bs1": 1.5,
    "scda_bs8": 1.5,
    "scda_car": 1.5,
    "scda_car_bs8": 1.5,
    "res101_ms": 4.0,
    "res101_bs8": 4.0,
}

QUICK = os.environ.get("SCDA_BENCH_QUICK", "") not in ("", "0")


def _iters(n: int) -> int:
    return max(n // 4, 3) if QUICK else n


def _structured_batches(cfg, n_batches, batch_size, seed=0, fog=0.0,
                        classes=None):
    """Distinct Cityscapes-size structured scenes -> prepped canvases.

    Returns list of (image (B,H,W,3) f32, im_info (B,3), gt (B,G,5),
    num (B,)) numpy batches, via the REAL prep path (BGR, mean
    subtract, scale rule, fixed canvas).
    """
    from scda_tpu.data.pipeline import prepare_image
    from scda_tpu.data.synthetic import SYNTH_CLASSES, _draw_scene

    classes = classes or SYNTH_CLASSES
    rng = np.random.RandomState(seed)
    g = cfg.data.max_gt_boxes
    batches = []
    for _ in range(n_batches):
        imgs, infos, gts, nums = [], [], [], []
        for _ in range(batch_size):
            rgb, boxes, labels = _draw_scene(
                rng, 1024, 2048, max_objects=8, classes=classes, fog=fog)
            bgr = np.ascontiguousarray(rgb[:, :, ::-1])
            canvas, scale, (vh, vw) = prepare_image(bgr, cfg.data)
            gt = np.zeros((g, 5), np.float32)
            n = min(len(boxes), g)
            gt[:n, :4] = boxes[:n] * scale
            gt[:n, 4] = labels[:n]
            imgs.append(canvas)
            infos.append([vh, vw, scale])
            gts.append(gt)
            nums.append(n)
        batches.append((
            np.stack(imgs), np.asarray(infos, np.float32),
            np.stack(gts), np.asarray(nums, np.int32),
        ))
    return batches


def _median_spread(samples):
    return (float(np.median(samples)),
            [round(float(min(samples)), 2), round(float(max(samples)), 2)])


def _serving_cfg(preset="vgg16", **model_over):
    from scda_tpu.config import get_config, replace_path

    cfg = get_config(preset)
    cfg = replace_path(cfg, "test.bf16_weights", True)
    cfg = replace_path(cfg, "data.image_size", (512, 1024))
    for k, v in model_over.items():
        cfg = replace_path(cfg, f"model.{k}", v)
    return cfg


def bench_inference(batch_size=1, preset="vgg16", **model_over):
    import jax
    import jax.numpy as jnp

    from scda_tpu.evals.detect import bf16_inference_params
    from scda_tpu.models.detector import forward_inference
    from scda_tpu.models.faster_rcnn import build_model, init_params

    cfg = _serving_cfg(preset, **model_over)
    model = build_model(cfg.model)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    # Serving config: bf16 kernels (cfg.test.bf16_weights above) —
    # inference is weight-HBM-bound (+5%, drift ~2e-4; RESULTS.md).
    params = bf16_inference_params(params)

    @jax.jit
    def fn(params, image, im_info):
        return forward_inference(model, params, image, im_info, cfg)

    n_inputs = 8
    raw = _structured_batches(cfg, n_inputs, batch_size, seed=1)
    images = [jax.device_put(jnp.asarray(b[0])) for b in raw]
    infos = [jax.device_put(jnp.asarray(b[1])) for b in raw]
    jax.block_until_ready(images)

    out = fn(params, images[0], infos[0])   # compile + warmup
    np.asarray(out.scores[0, 0:1])

    iters, repeats = _iters(100 if batch_size == 1 else 40), 5
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(params, images[i % n_inputs], infos[i % n_inputs])
        np.asarray(out.scores[0, 0:1])      # host fetch = barrier
        samples.append(iters * batch_size / (time.perf_counter() - t0))
    med, spread = _median_spread(samples)
    return med, spread, "bfloat16"


def bench_train(batch_size=1, **model_over):
    import jax
    import jax.numpy as jnp

    from scda_tpu.config import get_config, replace_path
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.train.state import create_train_state
    from scda_tpu.train.steps import make_train_step

    cfg = get_config("vgg16")
    cfg = replace_path(cfg, "data.image_size", (512, 1024))
    cfg = replace_path(cfg, "train.batch_size", batch_size)
    for k, v in model_over.items():
        cfg = replace_path(cfg, f"model.{k}", v)
    model = build_model(cfg.model)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    state = create_train_state(cfg, params)
    step = make_train_step(model, cfg)
    rng = jax.random.key(7)

    n_inputs = 4
    raw = _structured_batches(cfg, n_inputs, batch_size, seed=2)
    dev = [tuple(jax.device_put(jnp.asarray(x)) for x in b) for b in raw]
    jax.block_until_ready(dev)

    state, m = step(state, *dev[0], rng)    # compile
    float(m["loss"])

    iters, repeats = _iters(30), 5
    # Full discard window before sampling: state-chained configs showed
    # ±8% spread (BENCH_r04 train_bs1 [57.79, 67.38]) vs ≤1.5% on the
    # stateless serving rows — the first timed window was absorbing
    # steady-state warmup (donated-buffer/dispatch-pipeline fill) that a
    # single compile step does not flush.
    for i in range(iters):
        state, m = step(state, *dev[i % n_inputs], rng)
    float(m["loss"])
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, *dev[i % n_inputs], rng)
        float(m["loss"])                    # host fetch = barrier
        samples.append(iters * batch_size / (time.perf_counter() - t0))
    med, spread = _median_spread(samples)
    return med, spread, "float32"


def _bench_scda(car=False, batch_size=1):
    import jax
    import jax.numpy as jnp

    from scda_tpu.adapt.scda import (
        create_scda_state, init_discriminator, make_scda_train_step,
    )
    from scda_tpu.config import get_config, replace_path
    from scda_tpu.models.faster_rcnn import build_model, init_params
    from scda_tpu.train.state import create_train_state

    cfg = get_config("vgg16")
    cfg = replace_path(cfg, "data.image_size", (512, 1024))
    cfg = replace_path(cfg, "adapt.enabled", True)
    cfg = replace_path(cfg, "train.batch_size", batch_size)
    classes = None
    if car:
        # Config #4 protocol shape: one fg class, class-agnostic head,
        # alternating (GAN-style) D/G updates (RESULTS.md car-only run).
        cfg = replace_path(cfg, "model.num_classes", 2)
        cfg = replace_path(cfg, "model.class_agnostic", True)
        cfg = replace_path(cfg, "adapt.d_update", "alternating")
        classes = ("car",)

    model = build_model(cfg.model)
    params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
    det_state = create_train_state(cfg, params)
    d_model, d_params = init_discriminator(cfg, model, jax.random.key(1))
    state = create_scda_state(cfg, det_state, d_params)
    step = make_scda_train_step(model, d_model, cfg)
    rng = jax.random.key(11)

    n_inputs = 4
    src = _structured_batches(cfg, n_inputs, batch_size, seed=3,
                              classes=classes)
    tgt = _structured_batches(cfg, n_inputs, batch_size, seed=4, fog=0.4,
                              classes=classes)
    src_d = [tuple(jax.device_put(jnp.asarray(x)) for x in b) for b in src]
    tgt_d = [(jax.device_put(jnp.asarray(b[0])),
              jax.device_put(jnp.asarray(b[1]))) for b in tgt]
    jax.block_until_ready(src_d)

    state, m = step(state, *src_d[0], *tgt_d[0], rng)
    float(m["loss"])

    iters, repeats = _iters(20), 5
    # Discard window (see bench_train): flush steady-state warmup out of
    # the first timed sample on this state-chained config too.
    for i in range(iters):
        state, m = step(state, *src_d[i % n_inputs],
                        *tgt_d[i % n_inputs], rng)
    float(m["loss"])
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step(state, *src_d[i % n_inputs],
                            *tgt_d[i % n_inputs], rng)
        float(m["loss"])
        # per SOURCE image (the unit BASELINE #3 uses; each step also
        # processes batch_size target images).
        samples.append(iters * batch_size / (time.perf_counter() - t0))
    med, spread = _median_spread(samples)
    return med, spread, "float32"


CONFIG_RUNNERS = {
    "inference_bs1": lambda: bench_inference(1),
    "inference_bs8": lambda: bench_inference(8),
    "train_bs1": lambda: bench_train(1),
    "train_bs8": lambda: bench_train(8),
    "train_bs16": lambda: bench_train(16),
    "scda_bs1": lambda: _bench_scda(car=False),
    "scda_car": lambda: _bench_scda(car=True),
    "res101_ms": lambda: bench_inference(
        1, preset="res101", multiscale_roi=True),
    # Non-BASELINE extras LAST: if the capture window closes early, the
    # five BASELINE configs above are already persisted/emitted.
    "scda_bs8": lambda: _bench_scda(car=False, batch_size=8),
    "res101_bs8": lambda: bench_inference(
        8, preset="res101", multiscale_roi=True),
    "scda_car_bs8": lambda: _bench_scda(car=True, batch_size=8),
}

def _flops_per_image(name: str) -> float:
    """Analytic FLOPs/image for each config (scda_tpu.utils.flops)."""
    from scda_tpu.config import get_config, replace_path
    from scda_tpu.utils import flops as F

    canvas = (512, 1024)
    if name.startswith("inference"):
        return F.inference_flops_per_image(get_config("vgg16"), canvas)
    if name.startswith("train"):
        return F.train_flops_per_image(get_config("vgg16"), canvas)
    if name in ("scda_bs1", "scda_bs8"):
        return F.scda_step_flops_per_src_image(get_config("vgg16"), canvas)
    if name in ("scda_car", "scda_car_bs8"):
        cfg = get_config("vgg16")
        cfg = replace_path(cfg, "model.num_classes", 2)
        cfg = replace_path(cfg, "model.class_agnostic", True)
        return F.scda_step_flops_per_src_image(cfg, canvas)
    if name in ("res101_ms", "res101_bs8"):
        cfg = get_config("res101")
        cfg = replace_path(cfg, "model.multiscale_roi", True)
        return F.inference_flops_per_image(cfg, canvas)
    raise KeyError(name)


METRIC_NAMES = {
    "inference_bs1": HEADLINE_METRIC,
    "inference_bs8": "vgg16_fasterrcnn_inference_bs8_images_per_sec_per_chip",
    "train_bs1": "vgg16_fasterrcnn_train_bs1_images_per_sec_per_chip",
    "train_bs8": "vgg16_fasterrcnn_train_bs8_images_per_sec_per_chip",
    "train_bs16": "vgg16_fasterrcnn_train_bs16_images_per_sec_per_chip",
    "scda_bs1": "scda_adapt_step_src_images_per_sec_per_chip",
    "scda_bs8": "scda_adapt_step_bs8_src_images_per_sec_per_chip",
    "scda_car": "scda_car_alternating_src_images_per_sec_per_chip",
    "scda_car_bs8": "scda_car_alternating_bs8_src_images_per_sec_per_chip",
    "res101_ms": "res101_multiscale_inference_images_per_sec_per_chip",
    "res101_bs8": "res101_multiscale_inference_bs8_images_per_sec_per_chip",
}


def _preflight(
    deadline_s: int = int(os.environ.get("SCDA_BENCH_PREFLIGHT_S", "900")),
    probe_s: int = int(os.environ.get("SCDA_BENCH_PREFLIGHT_PROBE_S", "60")),
) -> bool:
    """Probe the device backend, retrying until ``deadline_s`` elapses.

    The axon relay can die and leave backend init hanging forever (the
    r3 outage) — but it can also flap and come back, so one
    all-or-nothing shot throws away recoverable rounds.  Each probe is
    a ``probe_s``-bounded subprocess; on failure we re-probe until the
    deadline, then emit a visible error JSON."""
    import subprocess
    import sys

    start = time.monotonic()
    attempt = 0
    reason = "backend init failed"
    while True:
        attempt += 1
        budget = min(probe_s, max(5, int(deadline_s -
                                         (time.monotonic() - start))))
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=budget,
            )
            if out.returncode == 0:
                return True
            tail = (out.stderr or out.stdout).strip().splitlines()[-1:]
            reason = tail[0] if tail else "backend init failed"
        except subprocess.TimeoutExpired:
            reason = f"backend probe timed out after {budget}s"
        elapsed = time.monotonic() - start
        if elapsed >= deadline_s:
            break
        print(f"# preflight attempt {attempt} failed "
              f"({reason[:120]}); retrying ({elapsed:.0f}s elapsed of "
              f"{deadline_s}s deadline)", flush=True)
    print(json.dumps({
        "metric": HEADLINE_METRIC, "value": 0.0, "unit": "images/sec",
        "vs_baseline": 0.0, "error": f"device backend unavailable after "
                                     f"{attempt} probes over {deadline_s}s: "
                                     f"{reason[:300]}",
    }), flush=True)
    return False


PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_partial.json")


def _persist_partial(table: dict, complete: bool) -> None:
    """Atomically write the accumulated table so a mid-run crash leaves
    a parseable on-disk record (in addition to the stdout protocol)."""
    try:
        tmp = PARTIAL_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"complete": complete, "configs": table}, f,
                      indent=1)
        os.replace(tmp, PARTIAL_PATH)
    except OSError:
        pass    # persistence is best-effort; stdout is the record


def _headline_record(table: dict, provisional: bool) -> dict:
    rec = dict(table[HEADLINE])
    rec["configs"] = {k: {kk: vv for kk, vv in v.items()
                          if kk != "metric"}
                      for k, v in table.items()}
    errored = sorted(k for k, v in table.items() if "error" in v)
    if errored:
        # A failed config is a FAILURE, not a measured zero (r4 ADVICE):
        # downstream consumers must be able to tell the two apart.
        rec["errors"] = errored
    if provisional:
        rec["provisional"] = True
    return rec


def main() -> None:
    if not _preflight():
        raise SystemExit(1)
    want = os.environ.get("SCDA_BENCH_CONFIGS", "")
    names = ([n.strip() for n in want.split(",") if n.strip()] if want
             else list(CONFIG_RUNNERS))
    has_headline = HEADLINE in names
    if has_headline:   # headline runs FIRST (provisional), prints last too
        names = [HEADLINE] + [n for n in names if n != HEADLINE]

    table = {}
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            med, spread, wdtype = CONFIG_RUNNERS[name]()
        except Exception as e:  # noqa: BLE001 — one config must not
            # sink the capture; the headline re-emit below still runs.
            if name == HEADLINE:
                raise        # nothing worth saving without the headline
            table[name] = {
                "metric": METRIC_NAMES[name], "value": 0.0,
                "unit": "images/sec", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:300],
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            _persist_partial(table, complete=False)
            print(json.dumps(table[name]), flush=True)
            if has_headline:
                print(json.dumps(_headline_record(
                    table, provisional=i != len(names) - 1)), flush=True)
            continue
        gflops = _flops_per_image(name) / 1e9
        entry = {
            "metric": METRIC_NAMES[name],
            "value": round(med, 2),
            "unit": "images/sec",
            "vs_baseline": round(med / BASELINES_IMG_PER_SEC[name], 2),
            "spread": spread,
            "weights_dtype": wdtype,
            "gflops_per_img": round(gflops, 1),
            "mfu": round(med * gflops / (PEAK_TFLOPS * 1e3), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        table[name] = entry
        _persist_partial(table, complete=False)
        if name != HEADLINE:
            print(json.dumps(entry), flush=True)
        if has_headline:
            # Re-emit the headline after every config so the LAST stdout
            # line is always a valid headline record at any crash point.
            done = i == len(names) - 1
            print(json.dumps(_headline_record(table, provisional=not done)),
                  flush=True)
    _persist_partial(table, complete=True)
    if any("error" in v for v in table.values()):
        raise SystemExit(3)   # headline emitted above; rc flags the gap


if __name__ == "__main__":
    main()
