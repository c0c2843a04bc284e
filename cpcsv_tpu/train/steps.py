"""Jitted D-step / G-step for the alternating GAN update.

Mirrors the reference per-step algebra (trainer.py:248-416):

  D phase (reference :295-360):
    sample st_fake / im_fake / se_fake with G (fresh noise, no grad to G),
    build conditions  st_mu = [c_mu | mean_t desc | characters]  (489)
                      im_mu = [im_motion | cim_mu]               (489)
    per D:  real/wrong/fake BCE + cate + optional order-consistency.

  G phase (reference :365-416):
    RE-sample with fresh noise (grads to G), adversarial losses through the
    (fixed) Ds, KL on both CA-Net posteriors, and for the cascade variant the
    latent-matching MSE over the two 4-level pyramids plus the seg
    autoencoder reconstruction MSE on real & fake masks;
    errG_total = im_errG + KL*im_kl
               + ratio*(se_errG*SEGMENT_RATIO + st_errG*IMAGE_RATIO + KL*st_kl)
               [+ (video_latent + reconstruct) * RECONSTRUCT_LOSS]
    (the reference computes image_latent_loss but does NOT add it to the
    total — quirk preserved; reference trainer.py:370-413.)

TPU-native structure: two jitted pure functions over the GLOBAL batch.
Data-parallelism = shard the batch leading axes over the mesh with
NamedSharding; XLA inserts the gradient all-reduces (no pmap/no NCCL-style
hand-written collectives). G-phase D forwards also thread the Ds'
batch-stats/spectral mutations back into the state, matching torch
train-mode semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpcsv_tpu.config import Config
from cpcsv_tpu.losses.gan_losses import (
    GLossOut,
    discriminator_loss,
    generator_loss,
    kl_loss,
)
from cpcsv_tpu.train.state import TrainState, make_adam


def _mse(a, b):
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _build_conditions(cfg: Config, st_batch, im_batch, c_mu, cim_mu):
    """st_mu / im_mu conditioning vectors (reference trainer.py:303-308)."""
    st_labels = st_batch["labels"]  # (B, T, 9)
    characters = (st_labels.mean(axis=1) > 0).astype(jnp.float32)
    st_desc_mean = st_batch["description"].mean(axis=1)  # (B, 356)
    st_mu = jnp.concatenate([c_mu, st_desc_mean, characters], axis=1)
    im_motion = jnp.concatenate([im_batch["description"], im_batch["labels"]], axis=1)
    im_mu = jnp.concatenate([im_motion, cim_mu], axis=1)
    return st_mu, im_mu


def _sample_all(cfg: Config, net_g, gen_vars, rng, st_batch, im_batch, want_latents):
    """Run both generator heads; returns outputs + mutated G variables."""
    st_motion = jnp.concatenate(
        [st_batch["description"], st_batch["labels"]], axis=2
    )  # (B,T,365)
    st_content = st_batch["description"]
    im_motion = jnp.concatenate([im_batch["description"], im_batch["labels"]], axis=1)
    im_content = im_batch["content"][:, :, : cfg.TEXT.DIMENSION]

    k1, k2 = jax.random.split(rng)
    st_out, mut1 = net_g.apply(
        gen_vars,
        st_motion,
        st_content,
        want_latents,  # seg: cascade needs the mask/latents in G phase
        method="sample_videos",
        rngs={"noise": k1},
        mutable=["batch_stats"],
    )
    gen_vars = {**gen_vars, "batch_stats": mut1["batch_stats"]}
    im_out, mut2 = net_g.apply(
        gen_vars,
        im_motion,
        im_content,
        True,  # image path always produces the mask for the seg D
        method="sample_images",
        rngs={"noise": k2},
        mutable=["batch_stats"],
    )
    gen_vars = {**gen_vars, "batch_stats": mut2["batch_stats"]}
    return st_out, im_out, gen_vars


def make_train_steps(cfg: Config, models, jit: bool = True, ratio: float = 1.0):
    """Returns (d_step, g_step), jitted unless jit=False (raw pure fns for
    composition, e.g. scanning many steps inside one program).

    d_step(state, rng, st_batch, im_batch, lr_d) -> (state, metrics)
    g_step(state, rng, st_batch, im_batch, lr_g) -> (state, metrics)

    Batch dicts (all jnp arrays, NHWC):
      st_batch: images (B,T,64,64,3), description (B,T,356), labels (B,T,9)
                [+ shuffled (B,T,64,64,3), order_labels (B,) when
                 USE_SEQ_CONSISTENCY]
      im_batch: images (B,64,64,3), description (B,356), labels (B,9),
                content (B,T,>=356) [+ images_seg (B,64,64,1) when
                 SEGMENT_LEARNING]
    """
    net_g, d_im, d_st, d_se = models
    tx = make_adam(cfg)
    use_segment = cfg.SEGMENT_LEARNING
    cascade = cfg.CASCADE_MODEL
    # `ratio` weights the story/seg G-loss group (reference GANTrainer's
    # ratio argument; main_pororo.py:137 always passes 1.0)
    seg_w, img_w = cfg.SEGMENT_RATIO, cfg.IMAGE_RATIO
    kl_coeff = cfg.TRAIN.COEFF.KL

    # ---------------------------------------------------------------- D step
    def d_step(state: TrainState, rng, st_batch, im_batch, lr_d):
        st_out, im_out, gen_vars = _sample_all(
            cfg, net_g, state.gen.variables(), rng, st_batch, im_batch, cascade
        )
        state = state.replace(gen=state.gen.with_mutations(gen_vars))
        st_fake = jax.lax.stop_gradient(st_out.image)
        im_fake = jax.lax.stop_gradient(im_out.image)
        se_fake = (
            jax.lax.stop_gradient(im_out.seg) if im_out.seg is not None else None
        )
        st_mu, im_mu = _build_conditions(
            cfg,
            st_batch,
            im_batch,
            jax.lax.stop_gradient(st_out.c_mu),
            jax.lax.stop_gradient(im_out.c_mu),
        )

        def one_d(model, net_state, real, fake, cond, cate_labels, extra):
            def loss_fn(params):
                variables = {
                    "params": params,
                    "batch_stats": net_state.batch_stats,
                    "spectral": net_state.spectral,
                }
                use_nce = cfg.USE_INFONCE
                tau = cfg.INFONCE_TEMPERATURE
                if extra is not None:  # story D with optional shuffle branch
                    if use_nce:
                        (pair, fl, ol), mut = model.apply(
                            variables, real, fake, cond, extra.get("shuffled"),
                            method="d_phase_infonce",
                            mutable=["batch_stats", "spectral"],
                        )
                        rl, wl = jnp.diagonal(pair), None
                    else:
                        (rl, wl, fl, ol), mut = model.apply(
                            variables, real, fake, cond, extra.get("shuffled"),
                            method="d_phase",
                            mutable=["batch_stats", "spectral"],
                        )
                        pair = None
                    out = discriminator_loss(
                        rl,
                        wl,
                        fl,
                        None,
                        None,
                        ol,
                        extra.get("order_labels"),
                        cfg.CONSISTENCY_RATIO,
                        pair_logits=pair,
                        infonce_temperature=tau,
                    )
                else:
                    if use_nce:
                        (pair, fl, cate), mut = model.apply(
                            variables, real, fake, cond,
                            method="d_phase_infonce",
                            mutable=["batch_stats", "spectral"],
                        )
                        rl, wl = jnp.diagonal(pair), None
                    else:
                        (rl, wl, fl, cate), mut = model.apply(
                            variables, real, fake, cond,
                            method="d_phase",
                            mutable=["batch_stats", "spectral"],
                        )
                        pair = None
                    out = discriminator_loss(
                        rl, wl, fl, cate, cate_labels,
                        pair_logits=pair, infonce_temperature=tau,
                    )
                return out.total, (out, mut)

            (loss, (out, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                net_state.params
            )
            new_state = net_state.apply_grads(tx, grads, lr_d).with_mutations(mut)
            return new_state, out

        metrics = {}
        if use_segment:
            new_d_se, se_out = one_d(
                d_se,
                state.d_se,
                im_batch["images_seg"],
                se_fake,
                im_mu,
                im_batch["labels"],
                None,
            )
            state = state.replace(d_se=new_d_se)
            metrics.update(
                {
                    "seg_D/loss": se_out.total,
                    "seg_D/real": se_out.real,
                    "seg_D/fake": se_out.fake,
                    "Accuracy/se_D": se_out.accuracy,
                }
            )

        new_d_im, im_outs = one_d(
            d_im,
            state.d_im,
            im_batch["images"],
            im_fake,
            im_mu,
            im_batch["labels"],
            None,
        )
        state = state.replace(d_im=new_d_im)

        # the story D ALWAYS gets a dict (possibly empty: no shuffle branch);
        # image/seg Ds get None — one_d dispatches on `extra is not None`,
        # NOT truthiness (an empty dict still means "story D")
        st_extra = (
            {
                "shuffled": st_batch["shuffled"],
                "order_labels": st_batch["order_labels"],
            }
            if cfg.USE_SEQ_CONSISTENCY
            else {}
        )
        new_d_st, st_outs = one_d(
            d_st,
            state.d_st,
            st_batch["images"],
            st_fake,
            st_mu,
            None,
            st_extra,
        )
        state = state.replace(d_st=new_d_st)

        metrics.update(
            {
                "img_D/loss": im_outs.total,
                "img_D/real": im_outs.real,
                "img_D/fake": im_outs.fake,
                "Accuracy/im_D": im_outs.accuracy,
                "st_D/loss": st_outs.total,
                "st_D/real": st_outs.real,
                "st_D/fake": st_outs.fake,
                "st_D/order": st_outs.consistency,
            }
        )
        return state, metrics

    # ---------------------------------------------------------------- G step
    def g_step(state: TrainState, rng, st_batch, im_batch, lr_g):
        def loss_fn(gen_params):
            gen_vars = {
                "params": gen_params,
                "batch_stats": state.gen.batch_stats,
            }
            st_out, im_out, gen_vars = _sample_all(
                cfg, net_g, gen_vars, rng, st_batch, im_batch, cascade
            )
            st_mu, im_mu = _build_conditions(
                cfg, st_batch, im_batch, st_out.c_mu, im_out.c_mu
            )
            st_mu = jax.lax.stop_gradient(st_mu)  # reference detaches conditions
            im_mu = jax.lax.stop_gradient(im_mu)

            d_muts = {}

            def run_g_phase(model, net_state, *args):
                variables = {
                    "params": net_state.params,
                    "batch_stats": net_state.batch_stats,
                    "spectral": net_state.spectral,
                }
                return model.apply(
                    variables,
                    *args,
                    method="g_phase",
                    mutable=["batch_stats", "spectral"],
                )

            se_g = GLossOut(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
            if use_segment:
                (fl, cate), mut = run_g_phase(d_se, state.d_se, im_out.seg, im_mu)
                d_muts["d_se"] = mut
                se_g = generator_loss(fl, cate, im_batch["labels"])

            (fl, cate), mut = run_g_phase(d_im, state.d_im, im_out.image, im_mu)
            d_muts["d_im"] = mut
            im_g = generator_loss(fl, cate, im_batch["labels"])

            # story D's g_phase computes consistency heads only when the
            # module was built with use_seq_consistency
            (fl, cf, cr), mut = run_g_phase(
                d_st, state.d_st, st_out.image, st_mu, st_batch["images"]
            )
            st_g = generator_loss(fl, None, None, cf, cr, cfg.CONSISTENCY_RATIO)
            d_muts["d_st"] = mut

            im_kl = kl_loss(im_out.c_mu, im_out.c_logvar)
            st_kl = kl_loss(st_out.c_mu, st_out.c_logvar)

            total = (
                im_g.total
                + im_kl * kl_coeff
                + ratio * (se_g.total * seg_w + st_g.total * img_w + st_kl * kl_coeff)
            )

            aux_metrics = {
                "G/im_KL": im_kl,
                "G/st_KL": st_kl,
                "G/KL": im_kl + ratio * st_kl,
                "G/consistency": st_g.consistency,
                "Accuracy/im_G": im_g.accuracy,
                "Accuracy/se_G": se_g.accuracy,
                "Accuracy/st_G": st_g.accuracy,
                "G/gan_loss": im_g.total + ratio * (img_w * st_g.total + se_g.total * seg_w),
            }

            if cascade and st_out.latents is not None:
                (h1, h2, h3, h4), (g1, g2, g3, g4) = st_out.latents
                video_latent = (
                    _mse(g1, h1) + _mse(g2, h2) + _mse(g3, h3) + _mse(g4, h4)
                )
                (h1, h2, h3, h4), (g1, g2, g3, g4) = im_out.latents
                image_latent = (
                    _mse(g1, h1) + _mse(g2, h2) + _mse(g3, h3) + _mse(g4, h4)
                )
                se_real = im_batch["images_seg"]
                recon_real, mut_g = net_g.apply(
                    gen_vars,
                    se_real,
                    method="train_autoencoder",
                    mutable=["batch_stats"],
                )
                gen_vars = {**gen_vars, "batch_stats": mut_g["batch_stats"]}
                recon_fake, mut_g = net_g.apply(
                    gen_vars,
                    im_out.seg,
                    method="train_autoencoder",
                    mutable=["batch_stats"],
                )
                gen_vars = {**gen_vars, "batch_stats": mut_g["batch_stats"]}
                reconstruct = (
                    _mse(recon_real, se_real) + _mse(recon_fake, im_out.seg)
                ) / 2.0
                # reference adds video_latent + reconstruct only (trainer.py:413)
                total = total + (video_latent + reconstruct) * cfg.RECONSTRUCT_LOSS
                aux_metrics.update(
                    {
                        "G/image_vae_loss": image_latent,
                        "G/video_vae_loss": video_latent,
                        "G/reconstruct_loss": reconstruct,
                    }
                )

            aux_metrics["G/loss"] = total
            return total, (aux_metrics, gen_vars, d_muts)

        (loss, (metrics, gen_vars, d_muts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.gen.params)
        new_gen = state.gen.apply_grads(tx, grads, lr_g).with_mutations(gen_vars)
        state = state.replace(
            gen=new_gen,
            d_im=state.d_im.with_mutations(d_muts["d_im"]),
            d_st=state.d_st.with_mutations(d_muts["d_st"]),
        )
        if "d_se" in d_muts:
            state = state.replace(d_se=state.d_se.with_mutations(d_muts["d_se"]))
        state = state.replace(step=state.step + 1)
        return state, metrics

    if not jit:
        return d_step, g_step
    # donate the state: params/opt-state buffers are updated in place in HBM
    d_step_jit = jax.jit(d_step, donate_argnums=(0,))
    g_step_jit = jax.jit(g_step, donate_argnums=(0,))
    return d_step_jit, g_step_jit


def make_scan_steps(cfg: Config, models, donate: bool = True, ratio: float = 1.0):
    """K alternating D+G updates in ONE jitted dispatch via lax.scan.

    MEASURED on v5e (readback-verified, 2026-08-16, deconv decode): 77.9
    ms/step steady-state at K=20 (83.2 at K=8) vs 80.7 ms per-step donated
    dispatches — each dispatch costs ~40-60 ms fixed on the tunnel, and the
    scan amortizes it while XLA still updates the params/optimizer carry in
    place (round-1's "scan 20x slower" was measured against the async-timing
    artifact and is void). CAVEAT: the consumer must read back a result per
    dispatch; two scan dispatches enqueued back-to-back with no readback
    between them serialized pathologically (~+400 ms each) on the tunnel.

    scan_steps(state, rng, st_batches, im_batches, lr_d, lr_g)
      -> (state, metrics)   with every batch leaf carrying a leading K axis
    and every metric leaf returned stacked over K (so the trainer can log
    each step at the reference cadence).
    """
    raw_d, raw_g = make_train_steps(cfg, models, jit=False, ratio=ratio)

    def body(state, x):
        key, st_batch, im_batch, lr_d, lr_g = x
        k_d, k_g = jax.random.split(key)
        state, d_metrics = raw_d(state, k_d, st_batch, im_batch, lr_d)
        state, g_metrics = raw_g(state, k_g, st_batch, im_batch, lr_g)
        return state, {**d_metrics, **g_metrics}

    def scan_steps(state, rng, st_batches, im_batches, lr_d, lr_g):
        K = jax.tree_util.tree_leaves(st_batches)[0].shape[0]
        keys = jax.random.split(rng, K)
        lr_d = jnp.broadcast_to(jnp.asarray(lr_d), (K,))
        lr_g = jnp.broadcast_to(jnp.asarray(lr_g), (K,))
        return jax.lax.scan(body, state, (keys, st_batches, im_batches, lr_d, lr_g))

    return jax.jit(scan_steps, donate_argnums=(0,) if donate else ())


def make_fused_step(cfg: Config, models):
    """One jitted dispatch for the full alternating update (D-step then
    G-step).

    MEASURED on v5e (readback-verified, 2026-08-16, deconv decode): 131.7
    ms/step vs 81.2 ms for the two separate donated dispatches — merging
    both phases into one XLA program defeats the in-place param/optimizer
    buffer updates (the fused program must keep both phases' liveness at
    once), a 1.6x regression. Kept only as a documented experiment
    (CPCSV_BENCH_STEP=fused); the trainer uses the split steps.
    """
    raw_d, raw_g = make_train_steps(cfg, models, jit=False)

    def fused(state, rng, st_batch, im_batch, lr_d, lr_g):
        k_d, k_g = jax.random.split(rng)
        state, d_metrics = raw_d(state, k_d, st_batch, im_batch, lr_d)
        state, g_metrics = raw_g(state, k_g, st_batch, im_batch, lr_g)
        return state, {**d_metrics, **g_metrics}

    return jax.jit(fused, donate_argnums=(0,))
