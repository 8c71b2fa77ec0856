"""OmniMNIST workload tests: projection, dataset, classifier learns."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.data.omni_mnist import (
    OmniMNIST, project_digit)
from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


class TestProjection:
    def test_digit_lands_at_center(self):
        d = np.zeros((28, 28), np.float32)
        d[10:18, 10:18] = 1.0
        pano = project_digit(d, 60, 120, u0=0.0, v0=0.0)
        assert pano.shape == (60, 120)
        # mass concentrated near pano center (u=0 -> col 60, v=0 -> row 30)
        cy, cx = np.unravel_index(pano.argmax(), pano.shape)
        assert abs(cy - 30) < 8 and abs(cx - 60) < 10
        assert pano[:5].sum() < 1e-3  # poles empty

    def test_rotation_moves_digit(self):
        d = np.ones((28, 28), np.float32)
        p0 = project_digit(d, 60, 120, u0=0.0, v0=0.0)
        p1 = project_digit(d, 60, 120, u0=2.0, v0=0.3)
        assert not np.allclose(p0, p1)
        assert abs(p0.sum() - p1.sum()) / p0.sum() < 0.8


class TestClassifier:
    def test_learns_two_classes(self, rng):
        imgs = np.zeros((32, 28, 28), np.float32)
        labels = np.arange(32) % 2
        imgs[labels == 0, 6:22, 6:10] = 1.0
        imgs[labels == 1, 6:10, 6:22] = 1.0
        ds = OmniMNIST(imgs, labels, pano_h=40, pano_w=80, random_rotate=False)

        import optax
        model = build(DETECTORS, {
            "type": "PanoSwinClassifier",
            "backbone": {"type": "PanoSwinTransformer", "in_chans": 1,
                         "embed_dim": 6, "depths": (1, 1), "num_heads": (1, 2),
                         "window_size": 4, "ape": True, "out_indices": (0, 1),
                         "drop_path_rate": 0.0},
            "num_classes": 2})
        x0, _ = ds[0]
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0[None]))
        tx = optax.adam(3e-3)
        params, bs = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        batch = np.stack([ds[i][0] for i in range(32)])
        labs = jnp.asarray(labels.astype(np.int32))
        X = jnp.asarray(batch)

        @jax.jit
        def step(params, bs, opt_state):
            def loss_fn(p):
                logits, upd = model.apply(
                    {"params": p, "batch_stats": bs}, X, train=True,
                    mutable=["batch_stats"])
                l = optax.softmax_cross_entropy(
                    logits, jax.nn.one_hot(labs, 2)).mean()
                return l, (upd["batch_stats"], logits)
            (l, (bs2, logits)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, u), bs2, opt_state, l, logits

        for _ in range(30):
            params, bs, opt_state, l, logits = step(params, bs, opt_state)
        acc = float((jnp.argmax(logits, -1) == labs).mean())
        assert acc > 0.9, (acc, float(l))
