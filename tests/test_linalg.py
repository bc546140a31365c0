"""Batch-first Cholesky/solve vs numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.solver.linalg import (
    cho_solve_batched,
    cholesky_batched,
    spd_solve_batched,
)

RNG = np.random.default_rng(0)


def random_spd_batch(B, n, cond=50.0):
    A = RNG.normal(size=(B, n, n))
    M = np.einsum("bij,bkj->bik", A, A) / n + np.eye(n)
    return M.astype(np.float64)


@pytest.mark.parametrize("n", [16, 48, 80])
def test_cholesky_matches_numpy(n):
    M = random_spd_batch(8, n)
    L = np.asarray(cholesky_batched(jnp.asarray(M)))
    L_np = np.linalg.cholesky(M)
    np.testing.assert_allclose(L, L_np, atol=1e-10)


@pytest.mark.parametrize("n", [16, 80])
def test_cho_solve_matches_numpy(n):
    M = random_spd_batch(8, n)
    rhs = RNG.normal(size=(8, n))
    L = cholesky_batched(jnp.asarray(M))
    x = np.asarray(cho_solve_batched(L, jnp.asarray(rhs)))
    x_np = np.linalg.solve(M, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, x_np, atol=1e-10)


@pytest.mark.parametrize("n", [20, 80, 100])  # incl. non-multiples of 16
def test_spd_solve_padding(n):
    M = random_spd_batch(4, n)
    rhs = RNG.normal(size=(4, n))
    x = np.asarray(spd_solve_batched(jnp.asarray(M), jnp.asarray(rhs)))
    x_np = np.linalg.solve(M, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, x_np, atol=1e-9)


def test_f32_accuracy():
    M = random_spd_batch(4, 80).astype(np.float32)
    rhs = RNG.normal(size=(4, 80)).astype(np.float32)
    x = np.asarray(spd_solve_batched(jnp.asarray(M), jnp.asarray(rhs)))
    x_np = np.linalg.solve(M.astype(np.float64), rhs.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, x_np, rtol=0, atol=5e-4)
