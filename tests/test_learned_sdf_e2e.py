"""End-to-end learning validation (slow): train NeuralDF on an analytic scene
and verify the LEARNED network steers the closed loop collision-free —
the full config-2 story with learned weights, no external data."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


@pytest.mark.slow
def test_learned_sdf_closed_loop():
    from train_synthetic import random_scene, train_sdf_on_scene, validate_closed_loop

    rng = np.random.default_rng(0)
    scene = random_scene(rng)
    module, params, loss = train_sdf_on_scene(
        scene, steps=400, log_every=0, log_fn=lambda *_: None
    )
    assert loss < 0.01, f"SDF regression did not converge: {loss}"

    clearance, err, fails = validate_closed_loop(scene, module, params)
    assert fails == 0
    assert clearance > 0.0, f"learned SDF failed to avoid: clearance {clearance}"
    assert err < 0.5, f"missed the goal: {err}"
