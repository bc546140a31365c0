"""Training-loop smoke tests: tiny synthetic datasets, one epoch, checkpoints
and resume (reference training scripts' contract, SURVEY.md §3.3/3.4/§5.4)."""

import numpy as np
import pytest

from sdf_nmpc_tpu.data.h5 import ImageDataset
from sdf_nmpc_tpu.nn import Encoder
from sdf_nmpc_tpu.training import (
    DfTrainConfig,
    VaeTrainConfig,
    load_checkpoint,
    save_checkpoint,
    train_df,
    train_vae,
)
from tests.test_data_engine import wall_range_image

H, W = 30, 50
METADATA = {
    "hfov": 0.7592,
    "vfov": 0.4903,
    "is_depth": False,
    "is_spherical": False,
    "shape_imgs": [1, H, W],
}


def tiny_dataset(n=4):
    imgs = np.stack([wall_range_image(1.5 + 0.5 * i)[None] for i in range(n)])
    return ImageDataset(imgs, range(n), preprocess=lambda x: x, augment=None)


def test_train_df_one_epoch_and_resume(tmp_path):
    import jax
    import jax.numpy as jnp

    enc = Encoder(1, 8, dropout_rate=0.0, batchnorm=False)
    enc_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)), with_logvar=True)

    cfg = DfTrainConfig(nb_epochs=1, batch_size=2, points_per_img=40, lr_nb_steps=2)
    module, params, hist = train_df(
        tiny_dataset(), tiny_dataset(2), METADATA, enc_vars, tmp_path,
        cfg=cfg, nn_kwargs={"layer_sizes": [16, 16, 16, 16]}, size_latent=8,
        encoder_module=enc, log_fn=lambda *_: None,
    )
    assert len(hist) == 1
    assert np.isfinite(hist[0]["train"]).all()
    assert (tmp_path / "weights.msgpack").exists()
    assert (tmp_path / "epochs" / "e0.msgpack").exists()

    # resume from epoch 1 (restart_from_epoch=1 loads e0)
    cfg2 = DfTrainConfig(nb_epochs=2, batch_size=2, points_per_img=40, lr_nb_steps=2)
    _, _, hist2 = train_df(
        tiny_dataset(), None, METADATA, enc_vars, tmp_path,
        cfg=cfg2, nn_kwargs={"layer_sizes": [16, 16, 16, 16]}, size_latent=8,
        restart_from_epoch=1, encoder_module=enc, log_fn=lambda *_: None,
    )
    assert hist2[0]["epoch"] == 1
    # cosine schedule position restored, not restarted
    assert hist2[0]["lr"] == cfg2.lr_at_epoch(1)


@pytest.mark.slow
def test_train_vae_one_epoch(tmp_path):
    cfg = VaeTrainConfig(size_latent=8, nb_epochs=1, batch_size=2, batchnorm=False,
                         dropout_rate=0.0)
    vae, variables, hist = train_vae(
        tiny_dataset(2), None, METADATA, tmp_path, cfg=cfg, log_fn=lambda *_: None
    )
    assert len(hist) == 1
    assert np.isfinite(hist[0]["train"]).all()
    assert (tmp_path / "weights.msgpack").exists()
