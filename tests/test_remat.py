"""Remat option: identical outputs/gradients, activations recomputed."""

import jax
import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.models.generator import StoryGenerator


def _gen(remat):
    return StoryGenerator(
        video_len=3,
        gf_dim=32,
        gf_dim_seg=16,
        use_segment=True,
        cascade=True,
        remat=remat,
    )


def test_remat_same_outputs_and_grads():
    motion = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 365)), jnp.float32)
    content = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 356)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}

    g0, g1 = _gen(False), _gen(True)
    v0 = g0.init(rngs, motion, content)
    # same params work for both (remat does not change the param tree)
    def loss(gen, variables):
        def f(params):
            out, _ = gen.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                motion,
                content,
                method="sample_videos",
                rngs={"noise": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return jnp.sum(jnp.square(out.image))

        return jax.value_and_grad(f)(variables["params"])

    with jax.default_matmul_precision("highest"):
        l0, grad0 = loss(g0, v0)
        l1, grad1 = loss(g1, v0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # recompute changes fp32 reduction order; grads agree to ~1e-3 abs
    for a, b in zip(jax.tree.leaves(grad0), jax.tree.leaves(grad1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=5e-3)
