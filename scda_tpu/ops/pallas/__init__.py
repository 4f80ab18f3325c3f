"""Pallas TPU kernels (L0 equivalents of the reference's CUDA ops).

Currently: :mod:`scda_tpu.ops.pallas.nms_kernel` — greedy NMS with
sequential-grid VMEM scratch (opt-in via SCDA_NMS_IMPL=pallas; the lax
formulation in scda_tpu.ops.nms is the fused-path default — measured
trade-off documented there).
"""

from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas  # noqa: F401
