"""Pallas TPU kernels (L0 equivalents of the reference's CUDA ops).

Currently: :mod:`scda_tpu.ops.pallas.nms_kernel` — greedy NMS with
sequential-grid VMEM scratch (opt-in via SCDA_NMS_IMPL=pallas; the lax
formulation in scda_tpu.ops.nms is the fused-path default — measured
trade-off documented there).
"""

import contextlib

from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas  # noqa: F401

# Kernel-gate backend override: the backbone gates (vgg.py / resnet.py)
# dispatch to Mosaic kernels only when tracing for a TPU.  CPU tests and
# the driver dry run need to force that branch (interpret mode) WITHOUT
# monkeypatching the process-global ``jax.default_backend`` — any other
# backend-gated code traced in the same window would be silently steered
# onto TPU-only paths.
_FORCED_GATE = None


def gate_backend_is_tpu() -> bool:
    """True when Mosaic kernel gates should take the Pallas branch."""
    if _FORCED_GATE is not None:
        return _FORCED_GATE
    import jax

    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def force_kernel_gate(value: bool):
    """Scoped override of the kernel-gate backend check only."""
    global _FORCED_GATE
    prev = _FORCED_GATE
    _FORCED_GATE = value
    try:
        yield
    finally:
        _FORCED_GATE = prev
