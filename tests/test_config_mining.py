"""Config system round-trips (YAML presets, dotted overrides, coercion)
and SCDA region-mining semantics."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.config import (
    Config, apply_overrides, config_from_yaml, get_config, replace_path,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_yaml_presets_parse(self):
        for name, checks in {
            "vgg16.yml": {"model.backbone": "vgg16"},
            "res101.yml": {"model.backbone": "resnet101",
                           "train.weight_decay": 1e-4,
                           "train.double_bias": False},
            "res101_ms.yml": {"model.multiscale_roi": True},
            "scda_foggy.yml": {"adapt.enabled": True,
                               "adapt.num_groups": 9},
            "scda_sim10k_car.yml": {"model.class_agnostic": True,
                                    "adapt.d_update": "alternating"},
            # Paper Table 3 protocol (KITTI -> Cityscapes car-only).
            "scda_kitti_car.yml": {"model.class_agnostic": True,
                                   "adapt.enabled": True,
                                   "adapt.d_update": "alternating"},
        }.items():
            cfg = config_from_yaml(os.path.join(REPO, "cfgs", name))
            for path, want in checks.items():
                node = cfg
                for part in path.split("."):
                    node = getattr(node, part)
                assert node == want, (name, path, node)

    def test_kitti_protocol_registered(self):
        """Paper Table 3 source/target registry names exist (the config
        shape is exercised at fixture scale by scripts/scda_kitti_ab.sh
        — same car-only protocol as config #4 with a KITTI-aspect
        source)."""
        from scda_tpu.data.voc import list_datasets

        names = list_datasets()
        assert "kitti_train" in names
        assert "cityscapes_car_train" in names
        assert "cityscapes_car_val" in names

    def test_dotted_override_coercion(self):
        cfg = Config()
        cfg = replace_path(cfg, "train.learning_rate", "0.01")
        assert cfg.train.learning_rate == 0.01
        cfg = replace_path(cfg, "anchors.scales", "2 4 8")
        assert cfg.anchors.scales == (2.0, 4.0, 8.0)
        cfg = replace_path(cfg, "model.multiscale_roi", "true")
        assert cfg.model.multiscale_roi is True
        cfg = replace_path(cfg, "data.image_size", "128 192")
        assert cfg.data.image_size == (128, 192)

    def test_unknown_path_raises(self):
        import pytest

        with pytest.raises(KeyError):
            replace_path(Config(), "train.bogus_knob", 1)

    def test_parse_set_list(self):
        # Both pair form (reference cfg_from_list parity) and key=value
        # form, mixed; a dangling key must raise, never silently drop
        # (the old zip() parsing turned '--set k=v' into a no-op — the
        # r5 counterfactual-arm incident).
        import pytest

        from scda_tpu.config import parse_set_list

        assert parse_set_list([]) == {}
        assert parse_set_list(["a.b", "1", "c.d", "2"]) == {
            "a.b": "1", "c.d": "2"}
        assert parse_set_list(["a.b=1", "c.d", "2", "e.f=x"]) == {
            "a.b": "1", "c.d": "2", "e.f": "x"}
        with pytest.raises(SystemExit):
            parse_set_list(["a.b"])
        with pytest.raises(SystemExit):
            parse_set_list(["a.b", "1", "dangling"])

    def test_configs_hashable_and_jit_static(self):
        cfg = get_config("vgg16")
        # Frozen dataclasses must be hashable (jit-static args).
        assert hash(cfg) == hash(get_config("vgg16"))
        cfg2 = apply_overrides(cfg, {"train.learning_rate": 0.1})
        assert hash(cfg2) != hash(cfg) or cfg2 != cfg


class TestRegionMining:
    def test_group_boxes_are_member_unions(self, rng):
        from scda_tpu.adapt.region_mining import mine_regions
        from scda_tpu.config import AdaptConfig

        # Two obvious spatial clusters of proposals.
        c1 = np.array([100.0, 100.0])
        c2 = np.array([400.0, 300.0])
        boxes = []
        for c in (c1, c2):
            for _ in range(8):
                cx, cy = c + rng.randn(2) * 5
                w, h = rng.uniform(20, 40, 2)
                boxes.append([cx - w/2, cy - h/2, cx + w/2, cy + h/2])
        boxes = np.asarray(boxes, np.float32)[None]     # (1, 16, 4)
        valid = np.ones((1, 16), bool)

        cfg = AdaptConfig(num_groups=2, mining_top_n=16, kmeans_iters=8)
        mined = mine_regions(jnp.asarray(boxes), jnp.asarray(valid), cfg,
                             jax.random.key(0))
        gb = np.asarray(mined.boxes[0])
        w = np.asarray(mined.weights[0])
        v = np.asarray(mined.valid[0])
        assert v.all()
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        # Each group box must contain its cluster centre and not the other.
        centers = 0.5 * (gb[:, :2] + gb[:, 2:])
        d1 = np.linalg.norm(centers - c1, axis=1)
        d2 = np.linalg.norm(centers - c2, axis=1)
        assert (d1 < 30).any() and (d2 < 30).any()
        # Weights reflect equal membership (8 each).
        np.testing.assert_allclose(w, [0.5, 0.5], atol=0.01)

    def test_invalid_proposals_excluded(self, rng):
        from scda_tpu.adapt.region_mining import mine_regions
        from scda_tpu.config import AdaptConfig

        boxes = np.asarray(rng.rand(1, 12, 4) * 100, np.float32)
        boxes[..., 2:] += boxes[..., :2] + 10
        valid = np.ones((1, 12), bool)
        valid[0, 6:] = False
        cfg = AdaptConfig(num_groups=3, mining_top_n=12, kmeans_iters=4)
        mined = mine_regions(jnp.asarray(boxes), jnp.asarray(valid), cfg,
                             jax.random.key(1))
        # Weights only count the 6 valid proposals.
        w = np.asarray(mined.weights[0])
        assert abs(w.sum() - 1.0) < 1e-5
