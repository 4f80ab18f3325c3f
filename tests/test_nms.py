"""NMS tests against a trivial O(N^2) numpy greedy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.ops.nms import nms, batched_nms


def np_greedy_nms(boxes, scores, thr, max_out, valid=None):
    """Sequential greedy oracle (the reference semantics,
    ref lib/model/nms/nms_cpu.py)."""
    order = np.argsort(-scores, kind="stable")
    if valid is not None:
        order = [i for i in order if valid[i]]
    keep = []
    for i in order:
        ok = True
        for j in keep:
            bi, bj = boxes[i], boxes[j]
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0]) + 1
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1]) + 1
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = (
                    (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
                    + (bj[2] - bj[0] + 1) * (bj[3] - bj[1] + 1)
                    - inter
                )
                if inter / ua > thr:
                    ok = False
                    break
        if ok:
            keep.append(i)
            if len(keep) >= max_out:
                break
    return keep


def random_cluttered_boxes(rng, n, size=600, cluster_frac=0.7):
    """Boxes with heavy overlap (clusters) to stress suppression chains."""
    n_clusters = max(1, n // 20)
    centers = rng.uniform(50, size - 50, (n_clusters, 2))
    out = []
    for _ in range(n):
        if rng.rand() < cluster_frac:
            cx, cy = centers[rng.randint(n_clusters)] + rng.randn(2) * 10
        else:
            cx, cy = rng.uniform(0, size, 2)
        w, h = rng.uniform(20, 120, 2)
        out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    boxes = np.array(out, np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


class TestNms:
    def test_matches_oracle_small(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 64)
        res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.5,
                  max_output=32, tile_size=16)
        got = list(np.asarray(res.indices)[np.asarray(res.valid)])
        want = np_greedy_nms(boxes, scores, 0.5, 32)
        assert got == want

    def test_matches_oracle_larger_than_tile(self, rng):
        for seed in range(5):
            r = np.random.RandomState(seed)
            boxes, scores = random_cluttered_boxes(r, 700)
            res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.7,
                      max_output=200, tile_size=128)
            got = list(np.asarray(res.indices)[np.asarray(res.valid)])
            want = np_greedy_nms(boxes, scores, 0.7, 200)
            assert got == want, f"seed {seed}"

    def test_early_exit_max_output(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 512, cluster_frac=0.0)
        res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.99,
                  max_output=10)
        got = list(np.asarray(res.indices)[np.asarray(res.valid)])
        want = np_greedy_nms(boxes, scores, 0.99, 10)
        assert got == want
        assert len(got) == 10

    def test_valid_mask_respected(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 128)
        valid = rng.rand(128) > 0.5
        res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.5,
                  max_output=64, valid=jnp.array(valid), tile_size=32)
        got = list(np.asarray(res.indices)[np.asarray(res.valid)])
        want = np_greedy_nms(boxes, scores, 0.5, 64, valid=valid)
        assert got == want

    def test_all_invalid(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 32)
        res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.5,
                  max_output=8, valid=jnp.zeros(32, bool))
        assert not np.asarray(res.valid).any()

    def test_identical_boxes_keep_one(self):
        boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (16, 1))
        scores = np.linspace(1, 0.1, 16).astype(np.float32)
        res = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.5,
                  max_output=8)
        got = np.asarray(res.indices)[np.asarray(res.valid)]
        assert list(got) == [0]

    def test_jit_and_shapes(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 256)
        fn = jax.jit(
            lambda b, s: nms(b, s, iou_threshold=0.5, max_output=100)
        )
        res = fn(jnp.array(boxes), jnp.array(scores))
        assert res.indices.shape == (100,)
        assert res.valid.shape == (100,)
        want = np_greedy_nms(boxes, scores, 0.5, 100)
        got = list(np.asarray(res.indices)[np.asarray(res.valid)])
        assert got == want

    def test_batched_per_class(self, rng):
        all_boxes, all_scores, valids = [], [], []
        for _ in range(8):  # 8 classes, as in test-time per-class NMS
            b, s = random_cluttered_boxes(rng, 300)
            all_boxes.append(b)
            all_scores.append(s)
            valids.append(rng.rand(300) > 0.3)
        res = batched_nms(
            jnp.array(np.stack(all_boxes)),
            jnp.array(np.stack(all_scores)),
            iou_threshold=0.3,
            max_output=100,
            valid=jnp.array(np.stack(valids)),
        )
        for c in range(8):
            got = list(np.asarray(res.indices[c])[np.asarray(res.valid[c])])
            want = np_greedy_nms(all_boxes[c], all_scores[c], 0.3, 100,
                                 valid=valids[c])
            assert got == want, f"class {c}"


class TestPallasKernel:
    """A/B: the Pallas kernel (interpret mode on CPU) must match both the
    lax implementation and the numpy oracle exactly."""

    def test_matches_lax_and_oracle(self, rng):
        from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas

        boxes, scores = random_cluttered_boxes(rng, 700)
        thr, max_out = 0.5, 40

        ref = np_greedy_nms(boxes, scores, thr, max_out)

        order = np.argsort(-scores, kind="stable")
        keep = nms_sorted_pallas(
            jnp.asarray(boxes[order]), jnp.ones((700,), bool),
            iou_threshold=thr, max_output=max_out, tile_size=128,
            interpret=True,
        )
        pal = order[np.asarray(keep)][:max_out]
        assert sorted(pal.tolist()) == sorted(ref)

        res = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  iou_threshold=thr, max_output=max_out, impl="lax")
        lax_idx = np.asarray(res.indices)[np.asarray(res.valid)]
        assert sorted(lax_idx.tolist()) == sorted(ref)

    def test_batched_matches_oracle(self, rng):
        from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas

        b, n, thr, max_out = 3, 300, 0.6, 25
        all_boxes, all_scores, all_valid = [], [], []
        for _ in range(b):
            bx, sc = random_cluttered_boxes(rng, n)
            v = rng.rand(n) > 0.1
            all_boxes.append(bx); all_scores.append(sc); all_valid.append(v)
        boxes = np.stack(all_boxes); scores = np.stack(all_scores)
        valid = np.stack(all_valid)

        order = np.argsort(-np.where(valid, scores, -np.inf), axis=1,
                           kind="stable")
        sboxes = np.take_along_axis(boxes, order[..., None], axis=1)
        svalid = np.take_along_axis(valid, order, axis=1)
        keep = nms_sorted_pallas(
            jnp.asarray(sboxes), jnp.asarray(svalid),
            iou_threshold=thr, max_output=max_out, tile_size=128,
            interpret=True,
        )
        keep = np.asarray(keep)
        for i in range(b):
            ref = np_greedy_nms(boxes[i], scores[i], thr, max_out,
                                valid=valid[i])
            pal = order[i][keep[i]][:max_out]
            assert sorted(pal.tolist()) == sorted(ref), f"row {i}"

    def test_public_api_pallas_impl(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 300)
        thr, max_out = 0.5, 30
        ref = np_greedy_nms(boxes, scores, thr, max_out)
        res = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  iou_threshold=thr, max_output=max_out, impl="pallas")
        idx = np.asarray(res.indices)[np.asarray(res.valid)]
        assert sorted(idx.tolist()) == sorted(ref)

        res_b = batched_nms(
            jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
            iou_threshold=thr, max_output=max_out, impl="pallas",
        )
        idx_b = np.asarray(res_b.indices[0])[np.asarray(res_b.valid[0])]
        assert sorted(idx_b.tolist()) == sorted(ref)


class TestPreSorted:
    def test_pre_sorted_matches_unsorted(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 400)
        thr, max_out = 0.5, 40
        order = np.argsort(-scores, kind="stable")
        res_ref = nms(jnp.asarray(boxes), jnp.asarray(scores),
                      iou_threshold=thr, max_output=max_out)
        res_ps = nms(jnp.asarray(boxes[order]),
                     jnp.asarray(scores[order]),
                     iou_threshold=thr, max_output=max_out,
                     pre_sorted=True)
        ref_ids = np.asarray(res_ref.indices)[np.asarray(res_ref.valid)]
        ps_ids = order[np.asarray(res_ps.indices)[np.asarray(res_ps.valid)]]
        assert ref_ids.tolist() == ps_ids.tolist()

    def test_pre_sorted_with_invalid_tail(self, rng):
        boxes, scores = random_cluttered_boxes(rng, 200)
        order = np.argsort(-scores, kind="stable")
        sb, ss = boxes[order], scores[order]
        valid = np.ones(200, bool)
        valid[150:] = False  # invalid tail (as from masked top_k)
        res = nms(jnp.asarray(sb), jnp.asarray(ss), iou_threshold=0.5,
                  max_output=30, valid=jnp.asarray(valid),
                  pre_sorted=True)
        ref = np_greedy_nms(sb, ss, 0.5, 30, valid=valid)
        ids = np.asarray(res.indices)[np.asarray(res.valid)]
        assert sorted(ids.tolist()) == sorted(ref)
