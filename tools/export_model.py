#!/usr/bin/env python
"""Export a detector forward to portable artifacts (reference
`tools/pytorch2onnx.py` role, TPU-native flavors):

  --format stablehlo : StableHLO MLIR text of the jitted simple_test
  --format exported  : jax.export serialized artifact (portable bytes; can
                       be reloaded with jax.export.deserialize and executed
                       — numerical equivalence asserted in
                       tests/test_export.py)
  --format savedmodel: TF SavedModel via jax2tf (when tensorflow present)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--shape", type=int, nargs=2, default=[512, 1024])
    p.add_argument("--format", choices=["stablehlo", "exported", "savedmodel"],
                   default="stablehlo")
    p.add_argument("--out", default="exported")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from panoswintransformerobjectdetection_tpu.apis.inference import init_detector

    if args.config:
        det, variables = init_detector(args.config, args.checkpoint)
    else:
        from __graft_entry__ import _flagship
        det = _flagship()
        variables = det.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))

    h, w = args.shape
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jnp.array([[float(h), float(w)]])
    sf = jnp.ones((1, 4), jnp.float32)

    def fn(images):
        return det.apply(variables, images, shapes, sf, method=det.simple_test)

    if args.format == "stablehlo":
        lowered = jax.jit(fn).lower(images)
        mlir = lowered.as_text()
        out = args.out + ".stablehlo.mlir"
        with open(out, "w") as f:
            f.write(mlir)
        print(f"wrote {out} ({len(mlir)} bytes of StableHLO)")
    elif args.format == "exported":
        exp = jax.export.export(jax.jit(fn))(images)
        blob = exp.serialize()
        out = args.out + ".jaxexport"
        with open(out, "wb") as f:
            f.write(blob)
        print(f"wrote {out} ({len(blob)} bytes; reload with "
              f"jax.export.deserialize)")
    else:
        from jax.experimental import jax2tf
        import tensorflow as tf
        tf_fn = tf.function(
            jax2tf.convert(fn, with_gradient=False),
            input_signature=[tf.TensorSpec((1, h, w, 3), tf.float32)],
            autograph=False)
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, args.out)
        print(f"wrote SavedModel to {args.out}/")


if __name__ == "__main__":
    main()
