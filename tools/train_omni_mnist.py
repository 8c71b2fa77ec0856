#!/usr/bin/env python
"""OmniMNIST classification training (reference
`lzx/omni_mnist/train_classification.py`): synthesizes digits if no MNIST
file is available, trains the tiny PanoSwin classifier, reports accuracy."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_digits(n, rng):
    """Procedural digit-like glyphs (zero-egress environment: no MNIST
    download); each class is a distinct stroke pattern + noise."""
    imgs = np.zeros((n, 28, 28), np.float32)
    labels = rng.integers(0, 10, n)
    for i, lab in enumerate(labels):
        im = np.zeros((28, 28), np.float32)
        r = 4 + lab
        yy, xx = np.mgrid[:28, :28]
        if lab % 2 == 0:
            im[((yy - 14) ** 2 + (xx - 14) ** 2 < r ** 2) &
               ((yy - 14) ** 2 + (xx - 14) ** 2 > (r - 3) ** 2)] = 1.0
        else:
            im[:, 12 + (lab % 3):16 + (lab % 3)] = 1.0
            im[8:12, 6:22] = (lab % 5) / 5.0
        im += rng.normal(0, 0.05, (28, 28))
        imgs[i] = np.clip(im, 0, 1)
    return imgs, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-test", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from panoswintransformerobjectdetection_tpu.data.omni_mnist import OmniMNIST
    from panoswintransformerobjectdetection_tpu.models import DETECTORS, build

    rng = np.random.default_rng(0)
    tr_x, tr_y = synthetic_digits(args.n_train, rng)
    te_x, te_y = synthetic_digits(args.n_test, rng)
    train = OmniMNIST(tr_x, tr_y)
    test = OmniMNIST(te_x, te_y, seed=1)

    model = build(DETECTORS, {
        "type": "PanoSwinClassifier",
        "backbone": {"type": "PanoSwinTransformer", "in_chans": 1,
                     "embed_dim": 12, "depths": (2, 2), "num_heads": (2, 4),
                     "window_size": 5, "ape": True, "out_indices": (0, 1),
                     "drop_path_rate": 0.0},
        "num_classes": 10})

    sample = jnp.zeros((1, 60, 120, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, bs, opt_state, imgs, labs):
        def loss_fn(p):
            logits, upd = model.apply({"params": p, "batch_stats": bs},
                                      imgs, train=True, mutable=["batch_stats"])
            onehot = jax.nn.one_hot(labs, 10)
            l = optax.softmax_cross_entropy(logits, onehot).mean()
            return l, (upd["batch_stats"], logits)
        (l, (bs2, logits)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == labs).mean()
        return params, bs2, opt_state, l, acc

    @jax.jit
    def infer(params, bs, imgs):
        return model.apply({"params": params, "batch_stats": bs}, imgs)

    params, bs = variables["params"], variables["batch_stats"]
    for epoch in range(args.epochs):
        for imgs, labs in train.batches(args.batch_size):
            params, bs, opt_state, l, acc = step(
                params, bs, opt_state, jnp.asarray(imgs), jnp.asarray(labs))
        print(f"epoch {epoch + 1}: loss {float(l):.4f} train-acc {float(acc):.3f}")

    correct = total = 0
    for imgs, labs in test.batches(args.batch_size, shuffle=False):
        pred = np.asarray(infer(params, bs, jnp.asarray(imgs))).argmax(-1)
        correct += (pred == labs).sum()
        total += len(labs)
    print(f"test accuracy: {correct / total:.3f}")


if __name__ == "__main__":
    main()
