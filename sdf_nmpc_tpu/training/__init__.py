"""Training loops for the SDF network and the VAE (optax/flax)."""

from .checkpoints import load_checkpoint, save_checkpoint
from .df import DfTrainConfig, sample_points, train_df
from .vae import VaeTrainConfig, train_vae
