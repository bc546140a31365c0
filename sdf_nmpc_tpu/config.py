"""Typed, immutable config system.

Reference behavior reproduced (sdf_nmpc/utils/config.py:9-44):
  * YAML file -> nested attribute-accessible config
  * vfov consistency validation against hfov/aspect_ratio
  * derived sensor extrinsics ``B_p_C`` (3,) and ``B_R_C`` (3,3)

TPU-first differences:
  * The config is deeply immutable and hashable, so it can be closed over at
    trace time or passed as a `static_argnum` to ``jax.jit``.  This realizes the
    reference's compiled-flags vs runtime-parameter split (SURVEY.md §5.6):
    everything in the config is *static* (changing it retraces); the runtime
    parameter vector ``p`` (flag, camera pose, q_d, latent) stays dynamic.
  * Lists become tuples; ``'None'``/``'null'`` strings normalize to ``None``
    (the reference YAML's ``slack_brake: None`` parses as the *string* "None",
    which would crash acados slack setup if ever used — we fix the intent).
"""

from __future__ import annotations

import math as _pymath
from pathlib import Path
from typing import Any, Mapping

import numpy as np
import yaml


def _normalize(value: Any) -> Any:
    if isinstance(value, dict):
        return FrozenConfig(value)
    if isinstance(value, (list, tuple)):
        return tuple(_normalize(v) for v in value)
    if isinstance(value, str) and value in ("None", "none", "null", "Null"):
        return None
    return value


class FrozenConfig(Mapping):
    """Immutable, hashable, attribute-accessible nested mapping.

    Mirrors the reference AttrDict (utils/config.py:9-27) but frozen so configs
    can key jit caches.
    """

    __slots__ = ("_data", "_hash")

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_data", {k: _normalize(v) for k, v in data.items()})
        object.__setattr__(self, "_hash", None)

    # mapping protocol
    def __getitem__(self, key):
        return self._data[key]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __contains__(self, key):
        return key in self._data

    # attribute access
    def __getattr__(self, key):
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        raise AttributeError("FrozenConfig is immutable; use .replace()")

    def get(self, key, default=None):
        return self._data.get(key, default)

    def __hash__(self):
        if self._hash is None:
            object.__setattr__(self, "_hash", hash(_freeze(self._data)))
        return self._hash

    def __eq__(self, other):
        return isinstance(other, FrozenConfig) and self._data == other._data

    def __repr__(self):
        return f"FrozenConfig({self._data!r})"

    def replace(self, **updates) -> "FrozenConfig":
        """Return a new config with top-level keys replaced (nested via dicts)."""
        merged = dict(self._data)
        for k, v in updates.items():
            if isinstance(v, Mapping) and isinstance(merged.get(k), FrozenConfig):
                merged[k] = merged[k].replace(**v)
            else:
                merged[k] = v
        return FrozenConfig(merged)

    def to_dict(self) -> dict:
        return {k: _thaw(v) for k, v in self._data.items()}


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, FrozenConfig):
        return _freeze(obj._data)
    if isinstance(obj, tuple):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(obj):
    if isinstance(obj, FrozenConfig):
        return obj.to_dict()
    if isinstance(obj, tuple):
        return [_thaw(v) for v in obj]
    return obj


def get_vfov(hfov: float, aspect_ratio: float, is_spherical: bool) -> float:
    """Half vertical fov from half horizontal fov + aspect ratio
    (reference: utils/math.py:286-291)."""
    if is_spherical:
        return hfov / aspect_ratio
    return float(np.arctan(np.tan(hfov) / aspect_ratio))


def _euler2rot_np(euler) -> tuple:
    """Z1Y2X3 rotation matrix as nested tuples (hashable)."""
    r, p, y = float(euler[0]), float(euler[1]), float(euler[2])
    cr, sr = _pymath.cos(r), _pymath.sin(r)
    cp, sp = _pymath.cos(p), _pymath.sin(p)
    cy, sy = _pymath.cos(y), _pymath.sin(y)
    return (
        (cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy),
        (cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy),
        (-sp, sr * cp, cr * cp),
    )


def load_config(config_file: str | Path) -> FrozenConfig:
    """Load a YAML config and attach derived sensor extrinsics.

    Mirrors reference Config (utils/config.py:30-44): validates vfov and derives
    ``sensor.B_p_C`` / ``sensor.B_R_C`` from robot.sensor_extrinsics.
    """
    with open(config_file, "r") as f:
        raw = yaml.safe_load(f)
    cfg = FrozenConfig(raw)

    vfov_cpt = get_vfov(cfg.sensor.hfov, cfg.sensor.aspect_ratio, cfg.sensor.is_spherical)
    assert abs(vfov_cpt - cfg.sensor.vfov) < 0.1, "check sensor fov in config file"

    b_p_c = tuple(float(v) for v in cfg.robot.sensor_extrinsics.position)
    b_r_c = _euler2rot_np(cfg.robot.sensor_extrinsics.orientation)
    return cfg.replace(sensor=dict(B_p_C=b_p_c, B_R_C=b_r_c))


def default_config() -> FrozenConfig:
    from . import default_config_dir

    return load_config(default_config_dir() / "default.yaml")


def sensor_extrinsics(cfg: FrozenConfig) -> tuple[np.ndarray, np.ndarray]:
    """(B_p_C, B_R_C) as numpy arrays."""
    return np.array(cfg.sensor.B_p_C, dtype=np.float64), np.array(cfg.sensor.B_R_C, dtype=np.float64)
