"""Native frame ring: preprocessing parity with the jnp pipeline, latest-wins
semantics, staleness watchdog, threaded producer."""

import threading
import time

import numpy as np
import pytest

from sdf_nmpc_tpu.perception.preprocessing import clip_distance, depth2range

try:
    from sdf_nmpc_tpu.runtime import FrameRing

    _HAVE_NATIVE = True
except Exception:  # g++ missing etc.
    _HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not _HAVE_NATIVE, reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def ring_cfg(cfg):
    return cfg.replace(sensor=dict(shape_imgs=[1, 30, 48]))


def test_push_latest_preprocessing_parity(ring_cfg):
    ring = FrameRing(ring_cfg, capacity=4)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 6000, size=(30, 48)).astype(np.uint16)  # mm

    ring.push(raw, timestamp=100.0)
    frame, ts, stale = ring.latest(timeout=1.0, now=100.1)
    assert ts == 100.0 and not stale

    # oracle: ClipDistance (mm_resolution from cfg) then Depth2Range
    expect = clip_distance(
        raw.astype(np.float32), ring_cfg.sensor.dmax, ring_cfg.sensor.mm_resolution
    )
    expect = depth2range(expect, ring_cfg.sensor.hfov, ring_cfg.sensor.vfov)
    np.testing.assert_allclose(frame, np.asarray(expect), atol=1e-5)


def test_latest_wins_and_watchdog(ring_cfg):
    ring = FrameRing(ring_cfg, capacity=2)
    for i in range(5):
        raw = np.full((30, 48), 1000 * i, np.uint16)
        ring.push(raw, timestamp=float(i))
    frame, ts, stale = ring.latest(timeout=1.0, now=4.5)
    assert ts == 4.0 and not stale
    assert ring.count == 5
    # stale when the newest frame is older than the timeout
    _, ts, stale = ring.latest(timeout=1.0, now=10.0)
    assert ts == 4.0 and stale


def test_empty_ring(ring_cfg):
    ring = FrameRing(ring_cfg)
    frame, ts, stale = ring.latest()
    assert frame is None and ts < 0 and stale


def test_threaded_producer(ring_cfg):
    ring = FrameRing(ring_cfg, capacity=4)
    n_frames = 200
    stop = threading.Event()

    def producer():
        for i in range(n_frames):
            raw = np.full((30, 48), i % 5000, np.uint16)
            ring.push(raw, timestamp=float(i))
        stop.set()

    t = threading.Thread(target=producer)
    t.start()
    reads = 0
    while not stop.is_set() or reads == 0:
        frame, ts, _ = ring.latest(timeout=1e9)
        if frame is not None:
            assert np.isfinite(frame).all()
            reads += 1
    t.join()
    assert ring.count == n_frames
    assert reads > 0
