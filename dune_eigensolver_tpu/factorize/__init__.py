from dune_eigensolver_tpu.factorize.banded import (
    BandedFactorization,
    banded_inverse_factory,
    banded_solve,
    factorize_banded,
    factorize_banded_device,
)
from dune_eigensolver_tpu.factorize.cg import cg_inverse_factory, cg_solve
from dune_eigensolver_tpu.factorize.host_lu import (
    FactorizedMatrix,
    factorize,
    lu_inverse_factory,
)


def default_inverse_factory(A_sh, **kw):
    """Pick the right shift-invert engine for the operand:

    * DIA (banded) operators -> block-banded partitioned-inverse factors
      solved by a scan of dense MXU matmuls (factorize.banded) — the
      TPU-native direct path;
    * anything else -> host SuperLU + chunk-scheduled gather trisolve
      (factorize.host_lu), the general fallback.
    """
    from dune_eigensolver_tpu.sparse.formats import DIAMatrix

    if isinstance(A_sh, DIAMatrix):
        return banded_inverse_factory(A_sh, **kw)
    return lu_inverse_factory(A_sh, **kw)


__all__ = [
    "BandedFactorization",
    "banded_inverse_factory",
    "banded_solve",
    "factorize_banded",
    "factorize_banded_device",
    "cg_inverse_factory",
    "cg_solve",
    "FactorizedMatrix",
    "factorize",
    "lu_inverse_factory",
    "default_inverse_factory",
]
