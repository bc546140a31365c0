"""ctypes bindings for the native C++ frame ring (csrc/frame_ring.cpp).

Compiles on demand into the package cache dir (one-time g++ invocation) —
keeping the wheel pure-Python while the sensor-ingestion hot path runs native.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import time
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "frame_ring.cpp"


def _build_lib() -> Path:
    from .. import cache_dir

    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = cache_dir() / f"libframe_ring_{tag}.so"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(out)],
            check=True,
        )
    return out


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_lib()))
        lib.frame_ring_create.restype = ctypes.c_void_p
        lib.frame_ring_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ]
        lib.frame_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.frame_ring_push_u16.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_double,
        ]
        lib.frame_ring_push_f32.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_double,
            ctypes.c_double,
        ]
        lib.frame_ring_latest.restype = ctypes.c_double
        lib.frame_ring_latest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int),
        ]
        lib.frame_ring_count.restype = ctypes.c_uint64
        lib.frame_ring_count.argtypes = [ctypes.c_void_p]
        lib.frame_ring_drops.restype = ctypes.c_uint64
        lib.frame_ring_drops.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class FrameRing:
    """SPSC latest-wins frame buffer with fused native preprocessing.

    Producer thread: ``push(raw_u16_mm, ts)`` — converts raw depth (sensor
    units) to the dmax-normalized float32 range image (ClipDistance +
    Depth2Range fused) without touching Python memory management.
    Consumer (control loop): ``latest(timeout)`` returns the newest frame and
    a staleness flag (the reference's timeout_img watchdog, README.md:215).
    """

    def __init__(self, cfg, capacity: int = 4):
        self._lib = _load()
        C, H, W = cfg.sensor.shape_imgs
        self.height, self.width = H, W
        self._handle = self._lib.frame_ring_create(
            H, W, capacity, float(cfg.sensor.dmax), float(cfg.sensor.mm_resolution),
            float(cfg.sensor.hfov), float(cfg.sensor.vfov), int(bool(cfg.sensor.is_depth)),
        )
        self._dmax = float(cfg.sensor.dmax)
        self._out = np.empty((H, W), np.float32)

    def push(self, raw, timestamp: float | None = None):
        ts = time.monotonic() if timestamp is None else float(timestamp)
        raw = np.ascontiguousarray(raw)
        if raw.dtype == np.uint16:
            self._lib.frame_ring_push_u16(
                self._handle, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), ts
            )
        elif raw.dtype == np.float32:
            self._lib.frame_ring_push_f32(
                self._handle, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ts,
                self._dmax,
            )
        else:
            raise TypeError(f"unsupported frame dtype {raw.dtype}")

    def latest(self, timeout: float = 1.0, now: float | None = None):
        """(frame float32 [0,1], timestamp, stale) — frame is None if empty."""
        now = time.monotonic() if now is None else float(now)
        stale = ctypes.c_int(0)
        ts = self._lib.frame_ring_latest(
            self._handle, self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            now, float(timeout), ctypes.byref(stale),
        )
        if ts < 0:
            return None, ts, True
        return self._out.copy(), ts, bool(stale.value)

    @property
    def count(self) -> int:
        return int(self._lib.frame_ring_count(self._handle))

    @property
    def drops(self) -> int:
        return int(self._lib.frame_ring_drops(self._handle))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.frame_ring_destroy(self._handle)
            self._handle = None
