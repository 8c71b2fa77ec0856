"""Golden parity of the SABL bucketing coder vs the reference torch code
(`mmdet/core/bbox/coder/bucketing_bbox_coder.py` bbox2bucket:144 /
bucket2bbox:268), incl. the offset_topk=2 soft fine-regression weights and
cls_ignore_neighbor — VERDICT r3 item 7."""

import numpy as np
import pytest

import jax.numpy as jnp

from reference_loader import load_reference_bucketing_coder
from panoswintransformerobjectdetection_tpu.models.sabl import (
    bucket_encode, bucket_decode, side_num_of)

ref = load_reference_bucketing_coder()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _boxes(rng, n, w=320, h=240):
    x1 = rng.uniform(0, w - 40, n)
    y1 = rng.uniform(0, h - 40, n)
    bw = rng.uniform(8, w / 3, n)
    bh = rng.uniform(8, h / 3, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1).astype(np.float32)


def _flatten_lrtd(x):
    """(N, 4, side) side-major -> reference layout (N, 4*side) [l r t d]."""
    return np.asarray(x).reshape(x.shape[0], -1)


class TestBucketEncode:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("cfg", [
        dict(num_buckets=14, scale_factor=1.7, offset_topk=2,
             offset_upperbound=1.0, cls_ignore_neighbor=True),
        dict(num_buckets=14, scale_factor=3.0, offset_topk=2,
             offset_upperbound=1.0, cls_ignore_neighbor=True),
        dict(num_buckets=8, scale_factor=1.5, offset_topk=2,
             offset_upperbound=0.5, cls_ignore_neighbor=False),
    ])
    def test_targets_match(self, seed, cfg):
        import torch
        rng = np.random.default_rng(seed)
        n = 64
        props = _boxes(rng, n)
        # gts correlated with proposals (realistic assignment geometry)
        gts = props + rng.normal(0, 6.0, props.shape).astype(np.float32)
        gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 2.0)

        r_off, r_ow, r_lab, r_cw = ref.bbox2bucket(
            torch.from_numpy(props), torch.from_numpy(gts),
            cfg["num_buckets"], cfg["scale_factor"], cfg["offset_topk"],
            cfg["offset_upperbound"], cfg["cls_ignore_neighbor"])

        m_off, m_ow, m_lab, m_cw = bucket_encode(
            jnp.asarray(props), jnp.asarray(gts), cfg["num_buckets"],
            cfg["scale_factor"], cfg["offset_topk"],
            cfg["offset_upperbound"], cfg["cls_ignore_neighbor"])

        np.testing.assert_allclose(_flatten_lrtd(m_off), r_off.numpy(),
                                   atol=1e-4)
        np.testing.assert_array_equal(_flatten_lrtd(m_ow), r_ow.numpy())
        # reference labels are one-hot (N, 4*side); mine are int (N, 4)
        side = side_num_of(cfg["num_buckets"])
        r_lab_int = r_lab.numpy().reshape(-1, 4, side).argmax(-1)
        np.testing.assert_array_equal(np.asarray(m_lab), r_lab_int)
        np.testing.assert_array_equal(_flatten_lrtd(m_cw), r_cw.numpy())


class TestBucketDecode:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_boxes_and_confidence_match(self, seed):
        import torch
        rng = np.random.default_rng(seed)
        n, K, sf = 32, 14, 1.7
        side = side_num_of(K)
        props = _boxes(rng, n)
        cls_preds = rng.normal(0, 1, (n, 4 * side)).astype(np.float32)
        offset_preds = rng.normal(0, 0.3, (n, 4 * side)).astype(np.float32)

        r_boxes, r_conf = ref.bucket2bbox(
            torch.from_numpy(props), torch.from_numpy(cls_preds),
            torch.from_numpy(offset_preds), K, sf, max_shape=(240, 320))

        m_boxes, m_conf = bucket_decode(
            jnp.asarray(props),
            jnp.asarray(cls_preds.reshape(n, 4, side)),
            jnp.asarray(offset_preds.reshape(n, 4, side)),
            K, sf, max_shape=(240, 320))

        np.testing.assert_allclose(np.asarray(m_boxes), r_boxes.numpy(),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(m_conf), r_conf.numpy(),
                                   atol=1e-5)

    def test_loss_value_golden(self):
        """Loss-value cross-check on the exact targets: BCE over one-hot
        labels with cls weights and smooth-L1 over offsets with topk
        weights computed from reference targets == computed from mine."""
        import torch
        rng = np.random.default_rng(3)
        n, K, sf = 48, 14, 1.7
        side = side_num_of(K)
        props = _boxes(rng, n)
        gts = props + rng.normal(0, 5.0, props.shape).astype(np.float32)
        gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 2.0)
        r_off, r_ow, r_lab, r_cw = ref.bbox2bucket(
            torch.from_numpy(props), torch.from_numpy(gts), K, sf)
        m_off, m_ow, m_lab, m_cw = bucket_encode(
            jnp.asarray(props), jnp.asarray(gts), K, sf)

        pred_cls = rng.normal(0, 1, (n, 4 * side)).astype(np.float32)
        pred_off = rng.normal(0, 0.3, (n, 4 * side)).astype(np.float32)

        from panoswintransformerobjectdetection_tpu.core import losses
        import jax
        onehot = jax.nn.one_hot(m_lab, side)
        l_cls_mine = losses.binary_cross_entropy(
            jnp.asarray(pred_cls.reshape(n, 4, side)), onehot, weight=m_cw,
            avg_factor=n * 4 * side)
        l_reg_mine = losses.smooth_l1_loss(
            jnp.asarray(pred_off.reshape(n, 4, side)), m_off, beta=1 / 9,
            weight=m_ow, avg_factor=n * 4 * 2)

        # the same losses computed from the REFERENCE targets
        l_cls_ref = losses.binary_cross_entropy(
            jnp.asarray(pred_cls), jnp.asarray(r_lab.numpy()),
            weight=jnp.asarray(r_cw.numpy()), avg_factor=n * 4 * side)
        l_reg_ref = losses.smooth_l1_loss(
            jnp.asarray(pred_off), jnp.asarray(r_off.numpy()), beta=1 / 9,
            weight=jnp.asarray(r_ow.numpy()), avg_factor=n * 4 * 2)
        assert abs(float(l_cls_mine) - float(l_cls_ref)) < 1e-6
        assert abs(float(l_reg_mine) - float(l_reg_ref)) < 1e-6
