from dune_eigensolver_tpu.factorize.cg import cg_inverse_factory, cg_solve
from dune_eigensolver_tpu.factorize.host_lu import (
    FactorizedMatrix,
    factorize,
    lu_inverse_factory,
)

__all__ = [
    "cg_inverse_factory",
    "cg_solve",
    "FactorizedMatrix",
    "factorize",
    "lu_inverse_factory",
]
