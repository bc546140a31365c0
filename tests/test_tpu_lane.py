"""On-TPU pytest lane: real Mosaic lowering of the Pallas kernels
(VERDICT r1 item 5).

The default CI run executes every kernel in interpret mode on CPU, which
cannot catch Mosaic lowering regressions (scoped-VMEM limits, scatter/gather
gaps, layout changes).  This subset runs the kernels at production shapes on
the actual chip:

    SDF_NMPC_TPU_TESTS=1 python -m pytest tests/test_tpu_lane.py -m tpu -q

(~5 min first run through the tunnel, cached compiles after; never run two
TPU processes at once.)  Tests self-skip when the backend is not a TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="requires the real TPU chip"
    ),
]

RNG = np.random.default_rng(42)


def test_fused_sdf_production_shape():
    """Fused Pallas SDF value+grad vs the AD path, production net (4x256,
    128-latent) at a production node batch, exact-f32 kernel mode."""
    from sdf_nmpc_tpu.nn import init_neural_df
    from sdf_nmpc_tpu.ops import make_fused_sdf, reference_value_and_grad

    L = 128
    module, params = init_neural_df(size_latent=L, layer_sizes=(256, 256, 256, 256), seed=0)
    fused = make_fused_sdf(module, params, dtype="f32")
    oracle = reference_value_and_grad(module, params)

    K = 4096
    pos = jnp.asarray(RNG.normal(size=(K, 3)).astype(np.float32))
    latent = jnp.asarray(RNG.normal(size=(K, L)).astype(np.float32) * 0.3)
    df_f, gr_f = jax.jit(fused)(pos, latent)
    with jax.default_matmul_precision("highest"):
        df_o, gr_o = jax.jit(oracle)(pos, latent)
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=5e-3)


def test_factor_solve_lanes_production_shape():
    """Lanes Cholesky factor+solve vs numpy f64 at the production Newton size
    (nz=80) and a production lane batch."""
    from sdf_nmpc_tpu.ops.qp_kernels import factor_solve_lanes

    B, n = 1024, 80
    A = RNG.normal(size=(B, n, n)).astype(np.float32)
    M = np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(n, dtype=np.float32)
    RHS = RNG.normal(size=(1, B, n)).astype(np.float32)
    want = np.linalg.solve(
        M.astype(np.float64), RHS[0].astype(np.float64)[..., None]
    )[..., 0]

    X = factor_solve_lanes(
        jnp.asarray(np.transpose(M, (1, 2, 0))),
        jnp.asarray(np.transpose(RHS, (0, 2, 1))),
    )
    got = np.transpose(np.asarray(X), (0, 2, 1))[0]
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 5e-4, rel


def test_ip_fused_matches_composed_production_shape():
    """Whole-iteration fused IP kernel vs the composed pallas path on a
    production-shaped QP batch (nz=80, nc=63), warm+stiff schedule."""
    from sdf_nmpc_tpu.solver.qp import QpData, solve_qp

    B, nz, nc = 256, 80, 63
    A = RNG.normal(size=(B, nz, nz)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) / nz + 10 * np.eye(nz, dtype=np.float32)
    qp = QpData(
        H=jnp.asarray(H),
        g=jnp.asarray(RNG.normal(size=(B, nz)).astype(np.float32) * 2),
        C=jnp.asarray(RNG.normal(size=(B, nc, nz)).astype(np.float32)),
        c0=jnp.asarray(RNG.normal(size=(B, nc)).astype(np.float32)),
        lh=jnp.full((B, nc), -0.1, jnp.float32),
        uh=jnp.full((B, nc), 0.1, jnp.float32),
        z1=jnp.full((B, nc), 2e2, jnp.float32),
        z2=jnp.full((B, nc), 5e1, jnp.float32),
        lb=jnp.full((B, nz), -0.7, jnp.float32),
        ub=jnp.full((B, nz), 0.7, jnp.float32),
    )
    with jax.default_matmul_precision("highest"):
        run = lambda impl: np.asarray(
            jax.jit(
                jax.vmap(
                    lambda q: solve_qp(
                        q, iters=19, stiff_iters=8, k_stiff=8, chol_impl=impl
                    ).dz
                )
            )(qp)
        )
        dz_f = run("fused")
        dz_p = run("pallas")
    assert np.abs(dz_f - dz_p).max() < 2e-4, np.abs(dz_f - dz_p).max()


def test_erk4_lanes_matches_jacfwd_production_shape():
    """Lanes ERK4 linearization vs the jacfwd path at a production node count."""
    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.models import make_model
    from sdf_nmpc_tpu.ops.lin_kernels import erk4_sens_lanes
    from sdf_nmpc_tpu.solver.integrator import erk4_with_sensitivities

    model = make_model(default_config())
    M = 8192
    x = RNG.normal(size=(M, 10)).astype(np.float32)
    x[:, 3:7] += np.array([1.5, 0, 0, 0], np.float32)
    u = RNG.uniform(-0.9, 0.9, size=(M, 4)).astype(np.float32)
    u[:, 0] = RNG.uniform(0.1, 0.9, size=M)
    dt = RNG.uniform(0.01, 0.1, size=M).astype(np.float32)

    xn, A, B = jax.jit(
        lambda xs, us, ds: erk4_sens_lanes(model.f_lanes, xs, us, ds)
    )(jnp.asarray(x), jnp.asarray(u), jnp.asarray(dt))
    with jax.default_matmul_precision("highest"):
        want = jax.jit(
            jax.vmap(lambda xv, uv, d: erk4_with_sensitivities(model.f, xv, uv, d))
        )(jnp.asarray(x), jnp.asarray(u), jnp.asarray(dt))
    np.testing.assert_allclose(np.asarray(xn), np.asarray(want[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(A), np.asarray(want[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(B), np.asarray(want[2]), atol=1e-4)


def test_contract_accuracy_on_hardware():
    """The BASELINE <=1e-3 u0 contract on the chip: production f32 path vs the
    checked-in CPU f64/40-iter golden (same workload as bench.py)."""
    from sdf_nmpc_tpu.utils import accuracy

    out = accuracy.check_accuracy()
    assert out["n_ok"] == out["n_scen"], out
    assert out["u0_max_err"] <= 1e-3, out


@pytest.mark.parametrize("budget", ["warm", "steady"])
def test_contract_warm_steady_on_hardware(budget):
    """Warm AND steady budgets hold the <=1e-3 contract on the chip (VERDICT
    r3 item 3): the steady budget sits one iteration above a measured accuracy
    cliff (15/6 -> 3.9e-4 but 14/8 -> 1.1e-3, docs/performance.md), so the
    gate must live in the lane, not only in the driver-run bench artifact."""
    from sdf_nmpc_tpu.utils import accuracy

    out = accuracy.check_warm_accuracy(budget=budget)
    assert out["n_ok"] == out["n_solves"], out
    assert out["u0_max_err"] <= 1e-3, out


def test_riccati_regime_contract_on_hardware():
    """N=40 (qp_backend auto -> riccati) holds the <=1e-3 contract on the
    chip against the independent-oracle golden (VERDICT r3 item 5)."""
    from pathlib import Path

    from sdf_nmpc_tpu.utils import accuracy

    gold_npz = accuracy.REF_NPZ.parent / "oracle_u0.npz"
    gold = np.load(gold_npz)
    if "n40_u0" not in gold:
        pytest.skip("n40 oracle goldens not generated")
    u0, status = accuracy.solve_batch(n=8, N=40)
    assert (status == 0).all()
    err = np.abs(u0 - gold["n40_u0"]).max()
    assert err <= 1e-3, f"n40 riccati on-hw vs oracle {err:.2e}"


def test_config3_encoder_in_the_loop_contract_on_hardware():
    """BASELINE config 3 with the ENCODER inside the contract (VERDICT r4
    item 4): the f32 on-hw render -> trained-VAE encode -> solve pipeline
    must match the CPU f64 render -> encode -> solve oracle to <=1e-3 — the
    last previously-ungated segment of the image -> command path (reference
    vae.py:37-44, controller.py:50-61)."""
    from sdf_nmpc_tpu.utils import accuracy

    if not accuracy.CONFIG3_NPZ.exists():
        pytest.skip("config3 oracle not generated (scripts/accuracy_tpu.py ref3)")
    out = accuracy.check_config3_accuracy()
    assert out["n_ok"] == out["n_scen"], out
    assert out["u0_max_err"] <= 1e-3, out
