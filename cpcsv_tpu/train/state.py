"""Train state: G + 3 discriminators, each with params, BN stats, spectral
state and an Adam optimizer (β=(0.5, 0.999), torch-parity — reference
`trainer.py:212-220`).

The learning rate is applied OUTSIDE `scale_by_adam` (updates are
`-lr * m̂/(√v̂+ε)`), so the trainer can feed the reference's manual
halving-with-doubling-interval schedule (`trainer.py:447-456`) as a plain
scalar argument to the jitted step — no re-jit on LR change.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from cpcsv_tpu.config import Config


def make_adam(cfg: Optional[Config] = None) -> optax.GradientTransformation:
    """Adam β=(0.5,0.999) (reference trainer.py:212-220). cfg.ADAM_MU_DTYPE
    = "bfloat16" stores the FIRST moment in bf16 (params/updates stay fp32;
    optax casts m̂ back to fp32 before the update math) — halves the m-buffer
    HBM traffic of the four per-net Adam updates. A/B knob for the MFU push;
    default fp32."""
    mu_dtype = None
    if cfg is not None:
        requested = getattr(cfg, "ADAM_MU_DTYPE", "float32")
        if requested not in ("float32", "bfloat16"):
            raise ValueError(
                f"ADAM_MU_DTYPE must be 'float32' or 'bfloat16', got {requested!r}"
            )
        if requested == "bfloat16":
            mu_dtype = jnp.bfloat16
    return optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8, mu_dtype=mu_dtype)


class NetState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "NetState":
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            spectral=variables.get("spectral", FrozenDict()),
            opt_state=tx.init(params),
        )

    def variables(self) -> dict:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "spectral": self.spectral,
        }

    def apply_grads(self, tx, grads, lr) -> "NetState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        scaled = jax.tree.map(lambda u: -lr * u, updates)  # gradient DESCENT
        params = optax.apply_updates(self.params, scaled)
        return self.replace(params=params, opt_state=new_opt)

    def with_mutations(self, mutated: dict) -> "NetState":
        new = self
        if "batch_stats" in mutated:
            new = new.replace(batch_stats=mutated["batch_stats"])
        if "spectral" in mutated:
            new = new.replace(spectral=mutated["spectral"])
        return new


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen: NetState
    d_im: NetState
    d_st: NetState
    d_se: Optional[NetState]


def create_train_state(
    cfg: Config, rng: jax.Array, models, video_len: int | None = None
) -> TrainState:
    """Initialize all nets (reference load_network_stageI, trainer.py:82-140)."""
    net_g, d_im, d_st, d_se = models
    T = video_len or cfg.VIDEO_LEN
    motion_dim = cfg.TEXT.DIMENSION + cfg.LABEL_NUM
    cond_dim = cfg.GAN.CONDITION_DIM + cfg.TEXT.DIMENSION + cfg.LABEL_NUM

    k_g, k_n, k_im, k_st, k_se = jax.random.split(rng, 5)
    motion = jnp.zeros((2, T, motion_dim))
    content = jnp.zeros((2, T, cfg.TEXT.DIMENSION))
    # jit the inits: one compiled program instead of op-by-op dispatch
    g_vars = jax.jit(net_g.init)({"params": k_g, "noise": k_n}, motion, content)

    imgs = jnp.zeros((2, cfg.IMSIZE, cfg.IMSIZE, 3))
    cond = jnp.zeros((2, cond_dim))
    im_vars = jax.jit(functools.partial(d_im.init, method="full_forward"))(
        k_im, imgs, cond
    )

    story = jnp.zeros((2, T, cfg.IMSIZE, cfg.IMSIZE, 3))
    st_vars = jax.jit(functools.partial(d_st.init, method="full_forward"))(
        k_st, story, cond
    )

    tx = make_adam(cfg)
    d_se_state = None
    if d_se is not None:
        masks = jnp.zeros((2, cfg.SESIZE, cfg.SESIZE, 1))
        se_vars = jax.jit(functools.partial(d_se.init, method="full_forward"))(
            k_se, masks, cond
        )
        d_se_state = NetState.create(se_vars, tx)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen=NetState.create(g_vars, tx),
        d_im=NetState.create(im_vars, tx),
        d_st=NetState.create(st_vars, tx),
        d_se=d_se_state,
    )
