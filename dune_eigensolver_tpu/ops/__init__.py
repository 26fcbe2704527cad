from dune_eigensolver_tpu.ops.ortho import (
    orthonormalize_blocked,
    b_orthonormalize_blocked,
    dot_products_diagonal,
    dot_products_all,
)

__all__ = [
    "orthonormalize_blocked",
    "b_orthonormalize_blocked",
    "dot_products_diagonal",
    "dot_products_all",
]
