import jax
import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.losses.gradient_penalty import gradient_penalty


def test_gradient_penalty_known_values():
    # critic(x) = sum(x): gradient is all-ones -> ||grad||_2 = sqrt(D)
    D = 16
    real = jnp.zeros((4, D))
    fake = jnp.ones((4, D))

    gp = gradient_penalty(lambda x: x.sum(axis=1), real, fake, jax.random.PRNGKey(0))
    expected = (np.sqrt(D) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expected, rtol=1e-5)

    # critic with unit-norm gradient -> zero penalty
    w = jnp.zeros((D,)).at[0].set(1.0)
    gp0 = gradient_penalty(lambda x: x @ w, real, fake, jax.random.PRNGKey(1))
    assert abs(float(gp0)) < 1e-10
