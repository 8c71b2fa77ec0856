"""RepPoints tests: moment transform + detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.reppoints import (
    moment_points2bbox)


def test_moment_points2bbox_matches_torch_std():
    import torch
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((5, 9, 2)).astype(np.float32) * 3
    mt = np.array([0.3, -0.2], np.float32)
    ours = np.asarray(moment_points2bbox(jnp.asarray(pts), jnp.asarray(mt),
                                         moment_mul=1.0))
    t = torch.tensor(pts)
    y, x = t[..., 0], t[..., 1]
    ym, xm = y.mean(-1, keepdim=True), x.mean(-1, keepdim=True)
    ystd = torch.std(y - ym, dim=-1, keepdim=True)
    xstd = torch.std(x - xm, dim=-1, keepdim=True)
    hw, hh = xstd * np.exp(0.3), ystd * np.exp(-0.2)
    want = torch.cat([xm - hw, ym - hh, xm + hw, ym + hh], -1).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_reppoints_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "RepPointsDetector",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(variables, imgs, shapes, gtb,
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss_pts_init"]) > 0   # point_assign found positives
    grads = jax.grad(lambda p: sum(det.apply(
        {**variables, "params": p}, imgs, shapes, gtb,
        jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)


def test_minmax_points2bbox():
    from panoswintransformerobjectdetection_tpu.models.reppoints import (
        minmax_points2bbox)
    pts = jnp.asarray(np.array(
        [[[1.0, 2.0], [3.0, -1.0], [-2.0, 5.0], [0.0, 0.0],
          [9.0, 9.0], [0, 0], [0, 0], [0, 0], [0, 0]]], np.float32))
    # pts are (y, x): full minmax covers all 9 points
    full = np.asarray(minmax_points2bbox(pts))
    np.testing.assert_allclose(full[0], [-1, -2, 9, 9])
    partial = np.asarray(minmax_points2bbox(pts, partial=True))
    np.testing.assert_allclose(partial[0], [-1, -2, 5, 3])


def test_reppoints_minmax_detector_trains(rng):
    det = build(DETECTORS, {
        "type": "RepPointsDetector",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
        "transform_method": "minmax",
    })
    B = 1
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    out, _ = det.apply(variables, imgs, jnp.full((B, 2), 64.0),
                       jnp.asarray([[[4, 4, 44, 44.]]]),
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert np.isfinite(float(out[k])), k


def test_gen_grid_from_reg_identity():
    from panoswintransformerobjectdetection_tpu.models.reppoints import (
        gen_grid_from_reg)
    prev = jnp.asarray([[-2.0, -2.0, 2.0, 2.0]])
    pts, box = gen_grid_from_reg(jnp.zeros((1, 4)), prev)
    np.testing.assert_allclose(np.asarray(box)[0], [-2, -2, 2, 2], atol=1e-6)
    p = np.asarray(pts).reshape(9, 2)
    # row-major 3x3 grid of (y, x) over the box
    np.testing.assert_allclose(p[0], [-2, -2], atol=1e-6)
    np.testing.assert_allclose(p[2], [-2, 2], atol=1e-6)   # row 0, col 2
    np.testing.assert_allclose(p[6], [2, -2], atol=1e-6)   # row 2, col 0
    np.testing.assert_allclose(p[4], [0, 0], atol=1e-6)    # center


def test_reppoints_grid_variant_trains(rng):
    det = build(DETECTORS, {
        "type": "RepPointsDetector",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
        "transform_method": "minmax",
        "use_grid_points": True,
        "init_assigner": "max_iou",
    })
    B = 1
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    out, _ = det.apply(variables, imgs, jnp.full((B, 2), 64.0),
                       jnp.asarray([[[4, 4, 44, 44.]]]),
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert np.isfinite(float(out[k])), k
    res = det.apply(variables, imgs, jnp.full((B, 2), 64.0),
                    jnp.ones((B, 4), jnp.float32), method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
