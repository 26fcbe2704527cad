from dune_eigensolver_tpu.oracle.analytic import (
    eigenvalues_laplace_dirichlet_2d,
    eigenvalues_laplace_dirichlet_3d,
)
from dune_eigensolver_tpu.oracle.scipy_oracle import (
    smallest_generalized,
    smallest_standard,
    largest_standard,
)

__all__ = [
    "eigenvalues_laplace_dirichlet_2d",
    "eigenvalues_laplace_dirichlet_3d",
    "smallest_generalized",
    "smallest_standard",
    "largest_standard",
]
