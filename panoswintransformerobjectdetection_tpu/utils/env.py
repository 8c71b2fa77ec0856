"""Environment report (`mmdet/utils/collect_env.py` analogue)."""

import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "OS": platform.platform(),
    }
    try:
        import jax
        info["JAX"] = jax.__version__
        try:
            devs = jax.devices()
            info["Devices"] = ", ".join(str(d) for d in devs)
            info["Default backend"] = jax.default_backend()
        except Exception as e:  # backend may be unavailable in some envs
            info["Devices"] = f"unavailable ({e})"
    except ImportError:
        pass
    for mod in ("flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            info[mod] = m.__version__
        except ImportError:
            pass
    try:
        from .. import __version__
        info["panoswintransformerobjectdetection_tpu"] = __version__
    except Exception:
        pass
    return info


if __name__ == "__main__":
    for k, v in collect_env().items():
        print(f"{k}: {v}")
