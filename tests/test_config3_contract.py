"""CPU-side gate for the BASELINE config-3 accuracy contract.

The on-hardware gate lives in tests/test_tpu_lane.py
(test_config3_encoder_in_the_loop_contract_on_hardware); this CPU test keeps
the machinery and the checked-in oracle honest in the default suite: the f32
render -> trained-VAE encode -> solve pipeline must track the f64 oracle
(tests/golden/config3_u0.npz, regenerated with
``python scripts/accuracy_tpu.py ref3`` whenever weights/ changes — see
CLAUDE.md runbook).
"""

import numpy as np

from sdf_nmpc_tpu.utils import accuracy


def test_config3_oracle_is_checked_in():
    assert accuracy.CONFIG3_NPZ.exists(), (
        "tests/golden/config3_u0.npz missing — run scripts/accuracy_tpu.py ref3"
    )


def test_config3_f32_matches_f64_oracle_cpu():
    out = accuracy.check_config3_accuracy()
    assert out["n_ok"] == out["n_scen"], out
    # CPU f32 floor measured 7.3e-5 at the r4 weights; gate at the BASELINE
    # contract the hardware lane uses
    assert out["u0_max_err"] <= 1e-3, out


def test_config3_oracle_matches_current_weights():
    """The golden must have been generated from the CURRENT weights/: an f64
    re-solve of scene 0 must reproduce the stored row (guards against a
    weights refresh without the runbook's ref3 regeneration)."""
    ref = np.load(accuracy.CONFIG3_NPZ)["u0"]
    u0, status = accuracy.solve_config3_batch(
        dict(dtype="float64", qp_iters=40), n=1
    )
    assert (status == 0).all()
    err = np.abs(u0[0] - ref[0]).max()
    assert err <= 1e-9, (
        f"config3 oracle stale vs current weights/ ({err:.2e}) — regenerate "
        "with scripts/accuracy_tpu.py ref3"
    )
