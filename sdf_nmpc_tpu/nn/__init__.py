"""Neural networks (flax): NeuralDF, VAE, MLP, embeddings, torch import."""

from .activation import sine
from .embeddings import PositionEmbedding, embedding_for
from .mlp import Mlp
from .neural_df import NeuralDF, init_neural_df, make_sdf_fn, siren_init
from .normalizer import NormalizerStats, compute_stats, normalize
from .resnet import ResBlock, ResBlockDeconv
from .vae import Decoder, Encoder, Vae, adaptive_avg_pool2d, sample_latent
