from dune_eigensolver_tpu.sparse.formats import (
    DIAMatrix,
    ELLMatrix,
    BSRMatrix,
    dia_from_scipy,
    ell_from_scipy,
    bsr_from_scipy,
)
from dune_eigensolver_tpu.sparse.spmm import spmm

__all__ = [
    "DIAMatrix",
    "ELLMatrix",
    "BSRMatrix",
    "dia_from_scipy",
    "ell_from_scipy",
    "bsr_from_scipy",
    "spmm",
]
