"""Pallas TPU kernels for the hot compute paths."""

from .sdf_fused import make_fused_sdf, pack_neural_df_params, reference_value_and_grad
