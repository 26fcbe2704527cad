from dune_eigensolver_tpu.solvers.result import EigenResult
from dune_eigensolver_tpu.solvers.standard import standard_largest, standard_inverse
from dune_eigensolver_tpu.solvers.generalized import generalized_inverse

__all__ = [
    "EigenResult",
    "standard_largest",
    "standard_inverse",
    "generalized_inverse",
]
