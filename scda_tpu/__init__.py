"""scda_tpu: TPU-native SCDA (Selective Cross-Domain Alignment) detection
framework — Faster R-CNN + region-mined adversarial domain adaptation,
rebuilt for JAX/XLA/Pallas from the reference CUDA/PyTorch design.
"""

import os as _os

__version__ = "0.1.0"

# Platform escape hatch: the host sitecustomize (axon TPU tunnel) forces
# jax_platforms="axon,cpu" via a pre-import, overriding the JAX_PLATFORMS
# env var.  SCDA_PLATFORM=cpu (or any platform list) re-forces it here,
# which works as long as no backend has initialised — scda_tpu is imported
# before any jax compute in every CLI/test entry point.
_plat = _os.environ.get("SCDA_PLATFORM")
if _plat:
    import jax as _jax

    try:
        from jax._src import xla_bridge as _xb

        _ok = not _xb.backends_are_initialized()
    except Exception:
        _ok = True
    if _ok:
        _jax.config.update("jax_platforms", _plat)
