"""Unrolled small-matrix kernels vs jnp.linalg references."""

import numpy as np
import pytest

import jax.numpy as jnp

from dune_eigensolver_tpu.ops.smalllinalg import (
    cholesky_unrolled,
    solve_lower_transpose_right,
)


@pytest.mark.parametrize("b", [1, 2, 8, 16])
def test_cholesky_unrolled(b, rng):
    X = rng.standard_normal((40, b))
    G = jnp.asarray(X.T @ X + b * np.eye(b))
    L = np.asarray(cholesky_unrolled(G))
    Lref = np.linalg.cholesky(np.asarray(G))
    np.testing.assert_allclose(L, Lref, atol=1e-12)


@pytest.mark.parametrize("b", [1, 3, 8])
def test_solve_lower_transpose_right(b, rng):
    X = rng.standard_normal((40, b))
    L = np.tril(rng.standard_normal((b, b))) + 3 * np.eye(b)
    Y = np.asarray(solve_lower_transpose_right(jnp.asarray(X), jnp.asarray(L)))
    Yref = X @ np.linalg.inv(L).T
    np.testing.assert_allclose(Y, Yref, atol=1e-10)
