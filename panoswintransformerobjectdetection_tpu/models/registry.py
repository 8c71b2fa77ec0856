"""String-keyed registries mapping config `type` names to module classes.

TPU-native analogue of the mmdet registry + `build_from_cfg` pattern
(`mmdet/models/builder.py:6-12`): configs stay plain dicts; `build` pops
`type` and instantiates the registered class with the remaining kwargs.
"""

from typing import Any, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, Any] = {}

    def register(self, cls=None, *, name: str = None):
        def _do(c):
            key = name or c.__name__
            if key in self._map and self._map[key] is not c:
                raise KeyError(f"{key} already registered in {self.name}")
            self._map[key] = c
            return c
        return _do(cls) if cls is not None else _do

    def get(self, key: str):
        if key not in self._map:
            raise KeyError(f"{key} not in registry {self.name}; have {sorted(self._map)}")
        return self._map[key]

    def __contains__(self, key):
        return key in self._map


BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
DETECTORS = Registry("detectors")
LOSSES = Registry("losses")


def register(registry: Registry, name: str = None):
    return registry.register(name=name)


def build(registry: Registry, cfg: dict, **extra):
    """Instantiate `cfg['type']` from `registry` with cfg (minus type) + extra."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    cls = registry.get(kind)
    cfg.update(extra)
    return cls(**cfg)
