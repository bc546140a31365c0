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


def test_stiff_factor_solve_matches_explicit():
    """Fused stiff kernel == explicit Woodbury on M = A + Cs' D Cs."""
    from sdf_nmpc_tpu.ops.qp_kernels import stiff_factor_solve, stiff_resolve

    B, n, k, r = 6, 16, 8, 2
    A = _spd_batch(B, n).astype(np.float32)
    Cs = RNG.normal(size=(B, k, n)).astype(np.float32)
    d_s = (10.0 ** RNG.uniform(2, 6, size=(B, k))).astype(np.float32)
    RHS = RNG.normal(size=(B, r, n)).astype(np.float32)
    R2 = RNG.normal(size=(B, 1, n)).astype(np.float32)

    X, handle = jax.vmap(stiff_factor_solve)(
        jnp.asarray(A), jnp.asarray(RHS), jnp.asarray(Cs), jnp.asarray(1.0 / d_s)
    )
    X2 = jax.vmap(stiff_resolve)(*handle, jnp.asarray(Cs), jnp.asarray(R2))

    for b in range(B):
        M = A[b].astype(np.float64) + Cs[b].astype(np.float64).T @ np.diag(
            d_s[b].astype(np.float64)
        ) @ Cs[b].astype(np.float64)
        want = np.linalg.solve(M, RHS[b].astype(np.float64).T).T
        np.testing.assert_allclose(np.asarray(X[b]), want, rtol=2e-3, atol=2e-4)
        want2 = np.linalg.solve(M, R2[b, 0].astype(np.float64))
        np.testing.assert_allclose(np.asarray(X2[b, 0]), want2, rtol=2e-3, atol=2e-4)


def test_solve_qp_fused_matches_composed():
    """chol_impl='fused' (whole-iteration IP kernel, interpreted off-TPU)
    matches the composed 'pallas' path on a real-shaped soft-constrained QP
    batch, warm and stiff phases included."""
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
    run = lambda impl: jax.vmap(
        lambda q: solve_qp(q, iters=12, stiff_iters=4, k_stiff=8, chol_impl=impl)
    )(qp)
    rf = run("fused")
    rp = run("pallas")
    np.testing.assert_allclose(
        np.asarray(rf.dz), np.asarray(rp.dz), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rf.kkt_residual), np.asarray(rp.kkt_residual), atol=1e-2
    )
    # duals feed warm starts only — loose check that they track
    np.testing.assert_allclose(
        np.asarray(rf.duals.sl), np.asarray(rp.duals.sl), rtol=0.1, atol=1e-3
    )


def test_condense_lanes_matches_scan():
    """Lanes condensing+rows kernel == the reference scan (batched/single)."""
    from sdf_nmpc_tpu.ops.condense_kernel import condense_nodes

    B, N, nx, nu, ny, nh = 3, 5, 4, 2, 6, 2
    A = jnp.asarray(RNG.normal(size=(B, N, nx, nx)) * 0.4, jnp.float32)
    Bm = jnp.asarray(RNG.normal(size=(B, N, nx, nu)), jnp.float32)
    d = jnp.asarray(RNG.normal(size=(B, N, nx)), jnp.float32)
    e0 = jnp.asarray(RNG.normal(size=(B, nx)), jnp.float32)
    Jyx = jnp.asarray(RNG.normal(size=(B, N, ny, nx)), jnp.float32)
    Jyu = jnp.asarray(RNG.normal(size=(B, N, ny, nu)), jnp.float32)
    res = jnp.asarray(RNG.normal(size=(B, N, ny)), jnp.float32)
    Jhx = jnp.asarray(RNG.normal(size=(B, N, nh, nx)), jnp.float32)
    Jhu = jnp.asarray(RNG.normal(size=(B, N, nh, nu)), jnp.float32)
    h = jnp.asarray(RNG.normal(size=(B, N, nh)), jnp.float32)
    args = (A, Bm, d, e0, Jyx, Jyu, res, Jhx, Jhu, h)

    out_b = jax.jit(jax.vmap(condense_nodes))(*args)
    for b in range(B):
        out_s = condense_nodes(*[a[b] for a in args])
        for got, want in zip(out_b, out_s):
            np.testing.assert_allclose(
                np.asarray(got[b]), np.asarray(want), rtol=1e-5, atol=1e-5
            )


def test_solve_qp_fused_unaligned_kstiff_falls_back():
    """k_stiff not a multiple of 8 must keep the stiff split (composed
    path), not silently drop it in the fused kernel."""
    from sdf_nmpc_tpu.solver.qp import QpData, solve_qp

    B, nz, nc = 3, 16, 10
    H = _spd_batch(B, nz)
    qp = QpData(
        H=jnp.asarray(H, jnp.float32),
        g=jnp.asarray(RNG.normal(size=(B, nz)) * 2, jnp.float32),
        C=jnp.asarray(RNG.normal(size=(B, nc, nz)), jnp.float32),
        c0=jnp.asarray(RNG.normal(size=(B, nc)), jnp.float32),
        lh=jnp.full((B, nc), -0.1, jnp.float32),
        uh=jnp.full((B, nc), 0.1, jnp.float32),
        z1=jnp.full((B, nc), 1e3, jnp.float32),
        z2=jnp.full((B, nc), 1e4, jnp.float32),
        lb=jnp.full((B, nz), -0.7, jnp.float32),
        ub=jnp.full((B, nz), 0.7, jnp.float32),
    )
    run = lambda impl: np.asarray(
        jax.vmap(
            lambda q: solve_qp(q, iters=12, stiff_iters=4, k_stiff=4,
                               chol_impl=impl).dz
        )(qp)
    )
    np.testing.assert_allclose(run("fused"), run("pallas"), atol=1e-4)
