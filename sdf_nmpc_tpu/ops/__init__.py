"""Pallas TPU kernels for the hot compute paths."""

from .sdf_fused import (
    make_fused_sdf,
    make_fused_sdf_vg,
    pack_neural_df_params,
    reference_value_and_grad,
)
from .qp_kernels import factor_solve_lanes, newton_factor_solve, newton_resolve, solve_lanes
