"""Data layer: dataset registry, fixed-shape pipeline, fixtures.

Importing the package activates every dataset family's registrations
(ref lib/datasets/factory.py imports all imdb modules at module scope).
"""

from scda_tpu.data import coco as _coco  # noqa: F401  (registers coco_*)
from scda_tpu.data import voc as _voc    # noqa: F401  (registers VOC sets)
