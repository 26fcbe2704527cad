"""Host-side eigenvalue oracles via scipy (ARPACK under the hood).

The reference validates against ARPACK++ through
``ArpackMLGeneo::ArPackPlusPlus_Algorithms`` (arpack_geneo_wrapper.hh:392-804)
— in particular ``computeGenSymShiftInvertMinMagnitude`` (:581-658), i.e.
ARPACK's symmetric generalized shift-invert mode with which="LM" around a
shift. scipy.sparse.linalg.eigsh wraps the same Fortran ARPACK, so these are
the same oracles (at 1e-14 they serve as ground truth in the convergence
protocol, src/dune-eigensolver.cc:559-565).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import eigsh


def _to_scipy(A):
    return A.to_scipy() if hasattr(A, "to_scipy") else sp.csr_matrix(A)


def smallest_generalized(A, B, nev: int, sigma: float = 0.0, tol: float = 0.0):
    """Smallest nev eigenvalues of A x = lambda B x by shift-invert at sigma.

    Matches computeGenSymShiftInvertMinMagnitude (arpack_geneo_wrapper.hh:581)
    — called with sigma = -shift by the driver (src/dune-eigensolver.cc:565).
    """
    As, Bs = _to_scipy(A).astype(np.float64), _to_scipy(B).astype(np.float64)
    vals, vecs = eigsh(As, k=nev, M=Bs, sigma=sigma, which="LM", tol=tol)
    order = np.argsort(vals)
    return vals[order], vecs[:, order]


def smallest_standard(A, nev: int, sigma: float = 0.0, tol: float = 0.0):
    """Smallest nev eigenvalues of A x = lambda x by shift-invert at sigma."""
    As = _to_scipy(A).astype(np.float64)
    vals, vecs = eigsh(As, k=nev, sigma=sigma, which="LM", tol=tol)
    order = np.argsort(vals)
    return vals[order], vecs[:, order]


def largest_standard(A, nev: int, tol: float = 0.0):
    """Largest nev eigenvalues of A x = lambda x, descending."""
    As = _to_scipy(A).astype(np.float64)
    vals, vecs = eigsh(As, k=nev, which="LA", tol=tol)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order]
