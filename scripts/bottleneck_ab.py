#!/usr/bin/env python
"""On-chip A/B for the fused bottleneck chain (ops/pallas/bottleneck_kernel).

Stage 1: standalone kernel at the production layer3 shape (compile
sanity + standalone speedup vs the XLA chain).
Stage 2: FUSED end-to-end — the full res101-ms serving program with
bottleneck_pallas on vs off (the verify-skill protocol: standalone wins
can lose fused).

Run: timeout 3600 python scripts/bottleneck_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def stage1():
    import jax
    import jax.numpy as jnp

    from scda_tpu.ops.pallas import bottleneck_kernel as bk

    rng = np.random.RandomState(0)
    B, H, W, F, N = 1, 32, 64, 256, 22
    C = 4 * F
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
    ws = (
        jnp.asarray(rng.randn(N, C, F).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(N, 1, F).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(N, 9, F, F).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(N, 1, F).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(N, F, C).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(N, 1, C).astype(np.float32) * 0.1),
    )

    t0 = time.time()
    fused = jax.jit(lambda x, *w: bk.bottleneck_chain(x, *w))
    out = fused(x, *ws)
    np.asarray(out[0, 0, 0, 0:1])
    print(f"stage1: fused kernel compiled in {time.time() - t0:.0f}s",
          flush=True)

    t0 = time.time()
    ref = jax.jit(lambda x, *w: bk.chain_reference(x, *w))
    rout = ref(x, *ws)
    np.asarray(rout[0, 0, 0, 0:1])
    print(f"stage1: XLA chain compiled in {time.time() - t0:.0f}s",
          flush=True)

    err = np.abs(np.asarray(out, np.float32) - np.asarray(rout, np.float32))
    scale = np.abs(np.asarray(rout, np.float32)).max() + 1e-6
    print(f"stage1: max rel err vs XLA chain = {err.max() / scale:.2e}",
          flush=True)

    xs = [jax.device_put(jnp.asarray(
        rng.randn(B, H, W, C).astype(np.float32) * 0.5)) for _ in range(8)]
    jax.block_until_ready(xs)
    for name, fn in (("fused", fused), ("xla", ref)):
        for _ in range(2):  # warm
            o = fn(xs[0], *ws)
        np.asarray(o[0, 0, 0, 0:1])
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for i in range(50):
                o = fn(xs[i % 8], *ws)
            np.asarray(o[0, 0, 0, 0:1])
            samples.append((time.perf_counter() - t0) / 50 * 1e3)
        print(f"stage1: {name} layer3 chain = {np.median(samples):.3f} ms "
              f"(min {min(samples):.3f})", flush=True)


def stage2():
    import bench

    for flag in (True, False, True):
        t0 = time.time()
        med, spread, _ = bench.bench_inference(
            1, preset="res101", multiscale_roi=True,
            bottleneck_pallas=flag)
        print(f"stage2: res101_ms serving bottleneck_pallas={flag}: "
              f"{med:.1f} img/s spread={spread} "
              f"(wall {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1", "both"):
        stage1()
    if which in ("2", "both"):
        stage2()
