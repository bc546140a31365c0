"""Batch-on-lanes QP kernels (ops/qp_kernels.py), interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf_nmpc_tpu.ops.qp_kernels import (
    factor_solve_lanes,
    factor_solve_lanes_with_L,
    solve_lanes,
)

RNG = np.random.default_rng(3)


def _spd_batch(B, n):
    A = RNG.normal(size=(B, n, n))
    return np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(n)


def test_factor_solve_lanes_matches_numpy():
    B, n, r = 256, 16, 2
    M = _spd_batch(B, n)
    RHS = RNG.normal(size=(r, B, n))
    X_ref = np.stack([np.linalg.solve(M, RHS[i][..., None])[..., 0] for i in range(r)])

    X = factor_solve_lanes(
        jnp.asarray(np.transpose(M, (1, 2, 0))),
        jnp.asarray(np.transpose(RHS, (0, 2, 1))),
        interpret=True,
    )
    X = np.transpose(np.asarray(X), (0, 2, 1))
    rel = np.abs(X - X_ref).max() / np.abs(X_ref).max()
    assert rel < 1e-4, rel


def test_factor_reuse_via_solve_lanes():
    B, n = 128, 16
    M = _spd_batch(B, n)
    rhs1 = RNG.normal(size=(1, B, n))
    rhs2 = RNG.normal(size=(2, B, n))
    M_bl = jnp.asarray(np.transpose(M, (1, 2, 0)))
    _, L = factor_solve_lanes_with_L(
        M_bl, jnp.asarray(np.transpose(rhs1, (0, 2, 1))), interpret=True
    )
    X2 = solve_lanes(L, jnp.asarray(np.transpose(rhs2, (0, 2, 1))), interpret=True)
    X2 = np.transpose(np.asarray(X2), (0, 2, 1))
    X_ref = np.stack(
        [np.linalg.solve(M, rhs2[i][..., None])[..., 0] for i in range(2)]
    )
    rel = np.abs(X2 - X_ref).max() / np.abs(X_ref).max()
    assert rel < 1e-4, rel


def test_solve_qp_pallas_backend_matches_custom():
    """chol_impl='pallas' (interpreted off-TPU) == 'custom' on a real-shaped
    soft-constrained QP batch, including the stiff Woodbury phase."""
    from sdf_nmpc_tpu.solver.qp import QpData, solve_qp

    B, nz, nc = 4, 16, 10
    H = _spd_batch(B, nz)
    g = RNG.normal(size=(B, nz)) * 2
    C = RNG.normal(size=(B, nc, nz))
    c0 = RNG.normal(size=(B, nc))
    qp = QpData(
        H=jnp.asarray(H, jnp.float32),
        g=jnp.asarray(g, jnp.float32),
        C=jnp.asarray(C, jnp.float32),
        c0=jnp.asarray(c0, jnp.float32),
        lh=jnp.full((B, nc), -0.1, jnp.float32),
        uh=jnp.full((B, nc), 0.1, jnp.float32),
        z1=jnp.full((B, nc), 1e3, jnp.float32),
        z2=jnp.full((B, nc), 1e4, jnp.float32),
        lb=jnp.full((B, nz), -0.7, jnp.float32),
        ub=jnp.full((B, nz), 0.7, jnp.float32),
    )
    run = lambda impl, ks: np.asarray(
        jax.vmap(
            lambda q: solve_qp(q, iters=12, stiff_iters=4, k_stiff=ks, chol_impl=impl).dz
        )(qp),
        np.float64,
    )
    # k_stiff=8 exercises the lanes-kernel T factorization (k_s % 8 == 0),
    # k_stiff=4 the XLA small-Cholesky fallback branch
    for ks in (8, 4):
        dz_p = run("pallas", ks)
        dz_c = run("custom", ks)
        assert np.abs(dz_p - dz_c).max() < 1e-4, (ks, np.abs(dz_p - dz_c).max())
