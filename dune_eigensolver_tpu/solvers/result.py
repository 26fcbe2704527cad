"""Solver result container."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EigenResult:
    """Result of an eigensolver run.

    ``eigenvalues``: (nev,) — sorted ascending for smallest-seeking solvers,
    descending for ``standard_largest`` (the reference returns them in
    iteration order, eigensolver.hh:107-111; we sort for a stable API).
    ``eigenvectors``: (n, nev) — columns are the (B-)orthonormal eigenvector
    approximations.
    ``iterations``: outer iterations executed.
    ``converged``: whether the stopping criterion fired before maxiter
    (non-convergence is not an error, matching eigensolver.hh:191,327).
    ``criterion``: final value of the stopping quantity (absolute
    Rayleigh-quotient change for the standard solvers, relative change for
    ``generalized_inverse``).
    ``ortho_monitor``: final loss-of-orthogonality monitor from
    B-orthonormalization (0 for solvers that do not use it).
    """

    eigenvalues: jax.Array
    eigenvectors: jax.Array
    iterations: jax.Array
    converged: jax.Array
    criterion: jax.Array
    ortho_monitor: jax.Array


jax.tree_util.register_dataclass(
    EigenResult,
    data_fields=[
        "eigenvalues",
        "eigenvectors",
        "iterations",
        "converged",
        "criterion",
        "ortho_monitor",
    ],
    meta_fields=[],
)


def sort_result(evals: jax.Array, Q: jax.Array, nev: int, descending: bool):
    """Order eigenpairs and truncate to nev (column layout)."""
    order = jnp.argsort(-evals if descending else evals)
    return evals[order][:nev], Q[:, order][:, :nev]


def sort_result_t(evals: jax.Array, Qt: jax.Array, nev: int, descending: bool):
    """Order eigenpairs and truncate to nev (transposed layout: vectors are
    rows of Qt)."""
    order = jnp.argsort(-evals if descending else evals)
    return evals[order][:nev], Qt[order][:nev]
