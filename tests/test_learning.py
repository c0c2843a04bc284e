"""Does the training machinery actually learn? GAN losses oscillate by
design, so the check targets the supervised pieces:

1. the cascade seg-autoencoder (train_autoencoder + MSE) must fit a fixed
   batch of masks when optimized alone;
2. a full G-step run must move the reconstruct loss downward over enough
   steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cpcsv_tpu.config import GanConfig, default_config
from cpcsv_tpu.models import generator_from_config
from tests.test_train_steps import tiny_cfg


def test_autoencoder_fits_fixed_batch():
    cfg = tiny_cfg(CASCADE_MODEL=True, SEGMENT_LEARNING=True)
    gen = generator_from_config(cfg)
    rng = np.random.default_rng(0)
    motion = jnp.zeros((2, 5, 365))
    content = jnp.zeros((2, 5, 356))
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        motion,
        content,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    # low-frequency stripes: representable through the 64->4 bottleneck
    h = np.arange(64)[None, :, None, None]
    phase = rng.uniform(0, np.pi, (8, 1, 1, 1))
    masks = jnp.asarray(
        (0.8 * np.sin(2 * np.pi * h / 32 + phase)).astype(np.float32)
        * np.ones((8, 64, 64, 1), np.float32)
    )

    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt):
        def loss_fn(p):
            recon, mut = gen.apply(
                {"params": p, "batch_stats": batch_stats},
                masks,
                method="train_autoencoder",
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.square(recon - masks)), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    losses = []
    for _ in range(60):
        params, batch_stats, opt, loss = step(params, batch_stats, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
