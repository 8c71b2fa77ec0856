#!/usr/bin/env python
"""Analytic FLOP count of a model forward (reference
`tools/analysis_tools/get_flops.py` / fvcore role) via XLA cost analysis."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--shape", type=int, nargs=2, default=[512, 1024])
    p.add_argument("--backbone-only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from panoswintransformerobjectdetection_tpu.apis.inference import init_detector

    if args.config:
        det, variables = init_detector(args.config)
    else:
        from __graft_entry__ import _flagship
        det = _flagship()
        variables = det.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))

    h, w = args.shape
    images = jnp.zeros((1, h, w, 3), jnp.float32)

    if args.backbone_only:
        def fn(im):
            return det.apply(variables, im, method=lambda m, x: m.backbone_m(x))
    else:
        shapes = jnp.array([[float(h), float(w)]])
        sf = jnp.ones((1, 4), jnp.float32)

        def fn(im):
            return det.apply(variables, im, shapes, sf, method=det.simple_test)

    lowered = jax.jit(fn).lower(images)
    cost = lowered.cost_analysis()
    flops = cost.get("flops", float("nan"))
    mem = cost.get("bytes accessed", float("nan"))
    print(f"input: 1x{h}x{w}x3")
    print(f"flops: {flops:.3e} ({flops / 1e9:.2f} GFLOPs)")
    print(f"bytes accessed: {mem:.3e}")


if __name__ == "__main__":
    main()
