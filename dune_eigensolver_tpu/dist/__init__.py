from dune_eigensolver_tpu.dist.mesh import ROW_AXIS, init_distributed, make_mesh
from dune_eigensolver_tpu.dist.mg import (
    make_sharded_mg_prec_fn,
    sharded_mg_geometry,
)
from dune_eigensolver_tpu.dist.windowed import (
    sharded_generalized_inverse_general,
    sharded_lobpcg_general,
    sharded_standard_largest_general,
    windowed_shard_plan,
)
from dune_eigensolver_tpu.dist.sharded import (
    dia_spmm_halo,
    dia_spmm_halo_t,
    halo_exchange,
    halo_exchange_t,
    local_diag_block,
    psum_reduce,
    schwarz_inverse_t,
    sharded_generalized_inverse,
    sharded_lobpcg_generalized,
    sharded_standard_inverse,
    sharded_standard_largest,
)

__all__ = [
    "ROW_AXIS",
    "make_mesh",
    "init_distributed",
    "make_sharded_mg_prec_fn",
    "sharded_mg_geometry",
    "dia_spmm_halo",
    "dia_spmm_halo_t",
    "halo_exchange",
    "halo_exchange_t",
    "local_diag_block",
    "psum_reduce",
    "schwarz_inverse_t",
    "sharded_generalized_inverse",
    "sharded_lobpcg_generalized",
    "sharded_standard_inverse",
    "sharded_standard_largest",
    "sharded_generalized_inverse_general",
    "sharded_lobpcg_general",
    "sharded_standard_largest_general",
    "windowed_shard_plan",
]
