"""GT data engine: collision checking, distance fields, samplers, datasets."""

from .augment import ImageAugmenter
from .collision import ColChecker
from .df_computer import DfComputer, generate_dist_grid, minpool_ignore_zeros
from .losses import (
    loss_kld,
    loss_mse_valid_pixels,
    loss_mse_valid_pixels_bias_distance,
    loss_mse_valid_pixels_bias_pos_dist,
    loss_mse_valid_pixels_bias_positive,
    loss_sdf,
    loss_weighted_bce,
)
from .points import imgs2points, imgs2points_masked, minpool, pixel_grid
from .pos_sampler import PosSampler
