#!/usr/bin/env python
"""On-chip A/B for the matmul-reformulated res101 RoI head
(cfg.model.head_matmul; models/backbones/resnet.py).

Stage 1: standalone layer4 head at the production shape
(300 RoIs, 7x7, 1024ch -> 4x4, 2048ch, bf16) — conv vs matmul path.
Stage 2: FUSED end-to-end — res101-ms serving with head_matmul on vs
off (A/B/A; the verify-skill protocol: standalone wins can lose fused).

Run: timeout 3600 python scripts/head_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def stage1():
    import jax
    import jax.numpy as jnp

    from scda_tpu.models.backbones.resnet import ResNetC4Head

    rng = np.random.RandomState(0)
    R = 300
    pooled_np = [rng.randn(R, 7, 7, 1024).astype(np.float32) * 0.5
                 for _ in range(8)]

    conv = ResNetC4Head(depth=101, dtype=jnp.bfloat16)
    mm = ResNetC4Head(depth=101, dtype=jnp.bfloat16, matmul=True)
    params = conv.init(jax.random.key(0), jnp.asarray(pooled_np[0]))[
        "params"]

    xs = [jax.device_put(jnp.asarray(p)) for p in pooled_np]
    jax.block_until_ready(xs)

    outs = {}
    for name, mod in (("conv", conv), ("matmul", mm)):
        fn = jax.jit(lambda p, x, m=mod: m.apply({"params": p}, x))
        t0 = time.time()
        o = fn(params, xs[0])
        np.asarray(o[0, 0:1])
        print(f"stage1: {name} head compiled in {time.time() - t0:.0f}s",
              flush=True)
        outs[name] = np.asarray(o, np.float32)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for i in range(50):
                o = fn(params, xs[i % 8])
            np.asarray(o[0, 0:1])
            samples.append((time.perf_counter() - t0) / 50 * 1e3)
        print(f"stage1: {name} layer4 head (300 RoIs) = "
              f"{np.median(samples):.3f} ms (min {min(samples):.3f})",
              flush=True)

    scale = np.abs(outs["conv"]).max() + 1e-6
    err = np.abs(outs["conv"] - outs["matmul"]).max() / scale
    print(f"stage1: max rel err conv vs matmul = {err:.2e}", flush=True)


def stage2():
    import bench

    for flag in (True, False, True):
        t0 = time.time()
        med, spread, _ = bench.bench_inference(
            1, preset="res101", multiscale_roi=True, head_matmul=flag)
        print(f"stage2: res101_ms serving head_matmul={flag}: "
              f"{med:.1f} img/s spread={spread} "
              f"(wall {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1", "both"):
        stage1()
    if which in ("2", "both"):
        stage2()
