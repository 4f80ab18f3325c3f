#!/usr/bin/env python
"""On-chip A/B for the commuted multiscale lateral projection
(cfg.model.ms_proj_after_pool; FasterRCNN.pool_multiscale).

The stride-8 align's HBM intermediate is sized R*P*C*(non-contracted
spatial axis); pooling the RAW 512-ch C3 level and projecting the
pooled (R, P, P, 512) tensor afterwards halves it and deletes the
full-map projection pass (exact linear commute — the pooled-side
projection is one MXU matmul plus a bias*weight-mass correction).

Fused end-to-end A/B/A: res101-ms serving bs=1 and bs=8 with the knob
off vs on (the verify-skill protocol — reformulations that win on
paper can lose fused).

Run: timeout 3600 python scripts/ms_proj_ab.py [1|8|both]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402,F401


def run(batch_size: int) -> None:
    import bench

    for flag in (False, True, False):
        t0 = time.time()
        med, spread, _ = bench.bench_inference(
            batch_size, preset="res101", multiscale_roi=True,
            ms_proj_after_pool=flag)
        print(f"res101_ms serving bs={batch_size} "
              f"ms_proj_after_pool={flag}: {med:.1f} img/s "
              f"spread={spread} (wall {time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("1", "both"):
        run(1)
    if which in ("8", "both"):
        run(8)
