"""Profiler trace analysis: top device ops from a jax.profiler trace.

Complements the ``trainval --profile DIR`` flag (SURVEY.md §5 — the
reference had only wall-clock prints): parses the xplane protobuf that
jax.profiler writes and aggregates per-op device time, so hot-spot
analysis works offline without TensorBoard.

Usage:
    python -m scda_tpu.utils.profiling /path/to/trace_dir [top_n]
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple


def _load_xspace(trace_dir: str):
    # The proto lives under tensorflow's bundled tsl tree in this image.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    ))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, paths[-1]


def top_device_ops(
    trace_dir: str, top_n: int = 20, device_substr: str = "TPU",
) -> List[Tuple[str, float]]:
    """Returns [(op_name, total_ms)] sorted by device time, descending."""
    xs, _ = _load_xspace(trace_dir)
    totals: Dict[str, int] = {}
    for plane in xs.planes:
        if device_substr not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    return [(name, ps / 1e9) for name, ps in ranked]


def main(argv=None) -> int:
    import sys

    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m scda_tpu.utils.profiling TRACE_DIR [N]")
        return 2
    top_n = int(args[1]) if len(args) > 1 else 20
    ops = top_device_ops(args[0], top_n)
    for name, ms in ops:
        print(f"{ms:10.3f} ms  {name[:100]}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
