"""Raw Cityscapes/Foggy/KITTI adapters + VOC converter round-trip.

The reference consumes pre-converted VOC trees whose converter lives
outside its repo; here both the raw adapters (data/cityscapes.py) and
the converter (scripts/convert_to_voc.py) are first-class and must
agree on the ground truth.
"""

import json
import os
import subprocess
import sys

import numpy as np

from scda_tpu.data.cityscapes import (
    load_cityscapes_dataset, load_kitti_dataset, parse_kitti_label,
    polygons_to_record,
)
from scda_tpu.data.voc import CITYSCAPES_CLASSES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _png(path, w, h, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)


def _city_tree(tmp_path, foggy=False, beta=0.02):
    """Two-city raw Cityscapes fixture (64x48 frames)."""
    root = os.path.join(str(tmp_path), "Cityscapes")
    objects = {
        "aachen_000000_000019": [
            {"label": "car", "polygon": [[10, 20], [30, 18], [28, 40],
                                         [12, 42]]},
            {"label": "person", "polygon": [[40, 5], [48, 5], [48, 30],
                                            [40, 30]]},
            {"label": "cargroup", "polygon": [[50, 30], [62, 30],
                                              [62, 45], [50, 45]]},
            {"label": "sky", "polygon": [[0, 0], [63, 0], [63, 10]]},
        ],
        "bochum_000001_000042": [
            {"label": "bicycle", "polygon": [[5, 5], [20, 5], [20, 25],
                                             [5, 25]]},
        ],
    }
    for stem, objs in objects.items():
        city = stem.split("_")[0]
        _png(os.path.join(root, "leftImg8bit", "train", city,
                          f"{stem}_leftImg8bit.png"), 64, 48)
        if foggy:
            _png(os.path.join(
                root, "leftImg8bit_foggy", "train", city,
                f"{stem}_leftImg8bit_foggy_beta_{beta:g}.png"), 64, 48)
        ann = os.path.join(root, "gtFine", "train", city,
                           f"{stem}_gtFine_polygons.json")
        os.makedirs(os.path.dirname(ann), exist_ok=True)
        with open(ann, "w") as f:
            json.dump({"imgHeight": 48, "imgWidth": 64,
                       "objects": objs}, f)
    return root


class TestCityscapesRaw:
    def test_polygons_to_boxes_and_groups(self, tmp_path):
        root = _city_tree(tmp_path)
        ds = load_cityscapes_dataset(root, "train")
        assert ds.classes == CITYSCAPES_CLASSES
        assert len(ds) == 2
        rec = {r.image_id: r for r in ds.records}["aachen_000000_000019"]
        # sky is not a detection class; car/person/cargroup survive.
        assert len(rec.boxes) == 3
        car_label = CITYSCAPES_CLASSES.index("car") + 1
        # The NON-difficult car box is the plain "car" polygon's hull
        # ("cargroup" shares the label but is difficult).
        [car_box] = [b for b, l, d in
                     zip(rec.boxes, rec.labels, rec.difficult)
                     if int(l) == car_label and not d]
        np.testing.assert_allclose(car_box, [10, 18, 30, 42])
        # the group box is the difficult one
        assert sum(rec.difficult) == 1
        assert rec.difficult[2]

    def test_raw_registry_val_keeps_difficult_only_images(
            self, tmp_path, monkeypatch):
        """Eval splits must NOT drop empty/difficult-only images (a
        dropped val frame can never charge false positives — r3 review);
        train mirrors the reference's filter_roidb drop."""
        import json

        from scda_tpu.data.cityscapes import register_raw_datasets
        from scda_tpu.data.voc import get_dataset

        root = _city_tree(tmp_path)
        # A val frame whose only object is a group (difficult-only).
        stem = "zurich_000000_000021"
        _png(os.path.join(root, "leftImg8bit", "val", "zurich",
                          f"{stem}_leftImg8bit.png"), 64, 48)
        ann = os.path.join(root, "gtFine", "val", "zurich",
                           f"{stem}_gtFine_polygons.json")
        os.makedirs(os.path.dirname(ann), exist_ok=True)
        with open(ann, "w") as f:
            json.dump({"imgHeight": 48, "imgWidth": 64, "objects": [
                {"label": "cargroup",
                 "polygon": [[5, 5], [30, 5], [30, 30], [5, 30]]},
            ]}, f)
        register_raw_datasets(str(tmp_path))
        val = get_dataset("cityscapes_raw_val")
        assert [r.image_id for r in val.records] == [stem]
        # Same frame in a train tree would be filtered (difficult-only).
        ds_train_like = load_cityscapes_dataset(root, "val")
        assert len(ds_train_like) == 0

    def test_foggy_shares_gt(self, tmp_path):
        root = _city_tree(tmp_path, foggy=True)
        clear = load_cityscapes_dataset(root, "train")
        foggy = load_cityscapes_dataset(root, "train", foggy_beta=0.02)
        assert len(foggy) == len(clear)
        for a, b in zip(clear.records, foggy.records):
            np.testing.assert_array_equal(a.boxes, b.boxes)
            assert "leftImg8bit_foggy" in b.image_path

    def test_kitti_label_parse(self):
        text = "\n".join([
            "Car 0.0 0 1.5 10 20 50 40 1 1 1 0 0 0 0",
            "Van 0.0 1 1.5 60 20 90 40 1 1 1 0 0 0 0",
            "Pedestrian 0.0 0 1.5 5 5 15 30 1 1 1 0 0 0 0",
            "Car 0.0 3 1.5 100 20 120 40 1 1 1 0 0 0 0",
            "DontCare -1 -1 -10 200 10 240 30 -1 -1 -1 -1000",
        ])
        boxes, labels, difficult = parse_kitti_label(text, 300, 100)
        # Car, Van, heavily-occluded Car, DontCare (Pedestrian dropped)
        assert len(boxes) == 4
        assert labels.tolist() == [1, 1, 1, 1]
        assert difficult.tolist() == [False, False, True, True]

    def test_kitti_tree(self, tmp_path):
        root = os.path.join(str(tmp_path), "KITTI")
        _png(os.path.join(root, "training", "image_2", "000000.png"),
             120, 40)
        os.makedirs(os.path.join(root, "training", "label_2"),
                    exist_ok=True)
        with open(os.path.join(root, "training", "label_2",
                               "000000.txt"), "w") as f:
            f.write("Car 0.0 0 1.5 10 5 60 35 1 1 1 0 0 0 0\n")
        ds = load_kitti_dataset(root)
        assert len(ds) == 1 and ds.classes == ("car",)
        np.testing.assert_allclose(ds.records[0].boxes[0],
                                   [10, 5, 60, 35])

    def test_difficult_only_kitti_record_filtered(self, tmp_path):
        """An image whose only annotations are DontCare/occluded carries
        no trainable gt (prepare_gt_boxes drops difficult boxes) and is
        filtered like an empty one — ref filter_roidb semantics.
        keep_empty=True opts back in (target-domain loading)."""
        root = os.path.join(str(tmp_path), "KITTI")
        for stem, label in [
            ("000000", "Car 0.0 0 1.5 10 5 60 35 1 1 1 0 0 0 0\n"),
            ("000001", "DontCare -1 -1 -10 60 10 90 30 -1 -1 -1 -1000\n"),
        ]:
            _png(os.path.join(root, "training", "image_2",
                              f"{stem}.png"), 120, 40)
            os.makedirs(os.path.join(root, "training", "label_2"),
                        exist_ok=True)
            with open(os.path.join(root, "training", "label_2",
                                   f"{stem}.txt"), "w") as f:
                f.write(label)
        ds = load_kitti_dataset(root)
        assert [r.image_id for r in ds.records] == ["000000"]
        ds_all = load_kitti_dataset(root, keep_empty=True)
        assert len(ds_all) == 2

    def test_converter_kitti_splits_and_difficult(self, tmp_path):
        """KITTI conversion honors --splits and writes the difficult
        flag so DontCare survives the round-trip."""
        root = os.path.join(str(tmp_path), "KITTI")
        _png(os.path.join(root, "training", "image_2", "000000.png"),
             120, 40)
        os.makedirs(os.path.join(root, "training", "label_2"),
                    exist_ok=True)
        with open(os.path.join(root, "training", "label_2",
                               "000000.txt"), "w") as f:
            f.write("Car 0.0 0 1.5 10 5 60 35 1 1 1 0 0 0 0\n"
                    "DontCare -1 -1 -10 60 10 90 30 -1 -1 -1 -1000\n")
        out = os.path.join(str(tmp_path), "KITTIVOC")
        r = subprocess.run(
            [sys.executable, "scripts/convert_to_voc.py", "kitti",
             "--root", root, "--out", out, "--splits", "training"],
            capture_output=True, text=True, cwd=REPO, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]

        from scda_tpu.data.voc import load_voc_dataset

        voc = load_voc_dataset(out, "train", ("car",), name="kvoc")
        [rec] = voc.records
        assert len(rec.boxes) == 2
        assert rec.difficult.tolist() == [False, True]

    def test_converter_roundtrip_matches_raw(self, tmp_path):
        """convert_to_voc.py's tree loads back through the VOC parser
        with identical ground truth (within integer rounding)."""
        root = _city_tree(tmp_path)
        out = os.path.join(str(tmp_path), "CityscapesVOC")
        r = subprocess.run(
            [sys.executable, "scripts/convert_to_voc.py", "cityscapes",
             "--root", root, "--out", out, "--splits", "train"],
            capture_output=True, text=True, cwd=REPO, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]

        from scda_tpu.data.voc import load_voc_dataset

        raw = load_cityscapes_dataset(root, "train")
        voc = load_voc_dataset(out, "train", CITYSCAPES_CLASSES,
                               name="conv")
        assert len(voc) == len(raw)
        for a, b in zip(raw.records, voc.records):
            assert a.image_id == b.image_id
            np.testing.assert_allclose(b.boxes, np.round(a.boxes),
                                       atol=0.5)
            np.testing.assert_array_equal(b.labels, a.labels)
            np.testing.assert_array_equal(b.difficult, a.difficult)
            assert os.path.exists(b.image_path)  # symlink resolves
