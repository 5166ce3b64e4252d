"""VAE adversarial training: LPIPS + PatchGAN loss and the two-optimizer
train steps.

Parity: the reference's AutoencodingEngine training path —
GeneralLPIPSWithDiscriminator (sgm/modules/autoencoding/losses/__init__.py:
88-246) driven by the alternating-optimizer training_step
(sgm/models/autoencoder.py:182-267). The reference ships this unused at
runtime (`lossconfig: torch.nn.Identity`); it exists for completeness of the
first-stage training capability.

TPU-native differences:
  - The perceptual net is pluggable: pass `perceptual_fn(x, y) -> (B,)`
    (e.g. models/lpips.LPIPSAlex with converted weights). taming's LPIPS is
    VGG-based; with no VGG weights in this image the alex variant is the
    honest local substitute — weights load through the same converter.
  - The adaptive discriminator weight (||∇_last nll|| / ||∇_last g||,
    losses/__init__.py:137-152) is computed with two jax.grad calls w.r.t.
    the decoder's output-conv kernel inside the jitted step.
  - The two Lightning optimizers become two explicit optax states updated by
    `ae_step` / `disc_step`, alternated by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    return jnp.where(global_step < threshold, value, weight)


def diagonal_gaussian_regularizer(
    z: Array, rng: Optional[Array] = None, sample: bool = True
) -> Tuple[Array, Dict[str, Array]]:
    """DiagonalGaussianRegularizer (sgm/modules/autoencoding/regularizers/
    __init__.py:23-42): moments → posterior sample (or mode) + per-batch-mean
    summed KL in the log dict."""
    from ..models.vae import DiagonalGaussian

    posterior = DiagonalGaussian(z)
    if sample and rng is None:
        # the torch reference samples from its global RNG; JAX needs the key
        raise ValueError(
            "diagonal_gaussian_regularizer(sample=True) requires an rng key "
            "(pass rng=..., or sample=False for the posterior mode)"
        )
    out = posterior.sample(rng) if sample else posterior.mode()
    kl = posterior.kl()
    return out, {"kl_loss": jnp.sum(kl) / kl.shape[0]}


class DiagonalGaussianRegularizer:
    """Config-instantiable class form (regularizer_config target in generic
    AutoencodingEngine YAMLs, autoencoder.py:141-146)."""

    def __init__(self, sample: bool = True):
        self.sample = sample

    def __call__(self, z: Array, rng: Optional[Array] = None):
        return diagonal_gaussian_regularizer(z, rng=rng, sample=self.sample)


def measure_perplexity(predicted_indices: Array, num_centroids: int) -> Tuple[Array, Array]:
    """Cluster-usage perplexity for VQ codes (regularizers/__init__.py:44-53):
    perplexity == num_centroids when all clusters are used equally."""
    encodings = jax.nn.one_hot(
        predicted_indices.reshape(-1), num_centroids, dtype=jnp.float32
    )
    avg_probs = encodings.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


def latent_lpips_loss(
    decode_fn: Callable[[Array], Array],
    perceptual_fn: Callable[[Array, Array], Array],
    latent_inputs: Array,
    latent_predictions: Array,
    image_inputs: Optional[Array] = None,
    split: str = "train",
    perceptual_weight: float = 1.0,
    latent_weight: float = 1.0,
    perceptual_weight_on_inputs: float = 0.0,
    scale_input_to_tgt_size: bool = False,
    scale_tgt_to_input_size: bool = False,
) -> Tuple[Array, Dict[str, Array]]:
    """LatentLPIPS (losses/__init__.py:19-84): latent-space L2 + LPIPS between
    the decodes of predicted and target latents, with an optional perceptual
    term against the original pixels (bicubic size adaptation). Weight
    semantics mirror the reference exactly, including the elementwise-L2
    return when perceptual_weight == 0. NHWC; decode/perceptual nets are
    passed as callables (flax modules bind their own params)."""
    log: Dict[str, Array] = {}
    l2 = (latent_inputs - latent_predictions) ** 2
    log[f"{split}/latent_l2_loss"] = l2.mean()
    loss: Array = l2
    recons = None
    if perceptual_weight > 0.0:
        recons = decode_fn(latent_predictions)
        targets = decode_fn(latent_inputs)
        p = perceptual_fn(targets, recons)
        loss = latent_weight * l2.mean() + perceptual_weight * p.mean()
        log[f"{split}/perceptual_loss"] = p.mean()
    if perceptual_weight_on_inputs > 0.0:
        if recons is None:
            recons = decode_fn(latent_predictions)
        assert image_inputs is not None, "perceptual_weight_on_inputs needs image_inputs"
        if scale_input_to_tgt_size:
            image_inputs = jax.image.resize(
                image_inputs,
                image_inputs.shape[:1] + recons.shape[1:3] + image_inputs.shape[3:],
                method="bicubic",
            )
        elif scale_tgt_to_input_size:
            recons = jax.image.resize(
                recons,
                recons.shape[:1] + image_inputs.shape[1:3] + recons.shape[3:],
                method="bicubic",
            )
        p2 = perceptual_fn(image_inputs, recons)
        loss = loss + perceptual_weight_on_inputs * p2.mean()
        log[f"{split}/perceptual_loss_on_inputs"] = p2.mean()
    return loss, log


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


@dataclasses.dataclass(frozen=True)
class VAEGanLossConfig:
    disc_start: int = 0
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    disc_loss: str = "hinge"  # or "vanilla"
    kl_weight: float = 1e-6   # regularization_weights["kl_loss"] equivalent
    logvar_init: float = 0.0


def _nll(cfg: VAEGanLossConfig, x: Array, xrec: Array, logvar: Array,
         perceptual_fn) -> Tuple[Array, Array]:
    rec = jnp.abs(x - xrec) * cfg.pixelloss_weight
    if cfg.perceptual_weight > 0.0 and perceptual_fn is not None:
        p = perceptual_fn(x, xrec)  # (B,)
        rec = rec + cfg.perceptual_weight * p.reshape(-1, 1, 1, 1)
    nll = rec / jnp.exp(logvar) + logvar
    return jnp.sum(nll) / x.shape[0], jnp.mean(rec)


def generator_loss(
    cfg: VAEGanLossConfig,
    vae,
    disc,
    vae_params,
    disc_vars: Dict[str, Any],
    logvar: Array,
    x: Array,
    rng: Array,
    global_step: Array,
    perceptual_fn: Optional[Callable] = None,
):
    """optimizer_idx=0 branch (losses/__init__.py:190-228): NLL(+perceptual)
    + adaptive-weighted generator GAN loss + KL."""
    from ..models.vae import AutoencoderKL, DiagonalGaussian

    moments = vae.apply(vae_params, x, method=AutoencoderKL.encode_moments)
    post = DiagonalGaussian(moments)
    z = post.sample(rng)
    kl = jnp.mean(post.kl())

    def decode(p):
        return vae.apply(p, z, method=AutoencoderKL.decode)

    xrec = decode(vae_params)
    nll_loss, rec_loss = _nll(cfg, x, xrec, logvar, perceptual_fn)

    # the torch discriminator stays in train() during the generator step, so
    # its BatchNorms see BATCH statistics (use_actnorm=False,
    # losses/__init__.py:121) — running stats near init would distort g_loss
    # and the adaptive weight early in training. Stat updates are discarded
    # (mutable=[]): the running stats advance in the discriminator's own step.
    logits_fake, _ = disc.apply(disc_vars, xrec, train=True, mutable=["batch_stats"])
    g_loss = -jnp.mean(logits_fake)

    # adaptive weight via grads of both scalars w.r.t. the decoder's last
    # conv kernel (autoencoder.get_last_layer / losses/__init__.py:137-152)
    def last_layer_grad(scalar_fn):
        # decoder's output conv kernel: decoder/conv_out/Conv_0/kernel
        def wrt_last(kernel):
            conv_out = vae_params["params"]["decoder"]["conv_out"]
            node = {**conv_out, "Conv_0": {**conv_out["Conv_0"], "kernel": kernel}}
            p = {
                **vae_params,
                "params": {
                    **vae_params["params"],
                    "decoder": {**vae_params["params"]["decoder"], "conv_out": node},
                },
            }
            return scalar_fn(decode(p))

        kernel = vae_params["params"]["decoder"]["conv_out"]["Conv_0"]["kernel"]
        return jax.grad(wrt_last)(kernel)

    if cfg.disc_factor > 0.0:
        nll_g = last_layer_grad(lambda xr: _nll(cfg, x, xr, logvar, perceptual_fn)[0])
        gan_g = last_layer_grad(
            lambda xr: -jnp.mean(
                disc.apply(disc_vars, xr, train=True, mutable=["batch_stats"])[0]
            )
        )
        d_weight = jnp.linalg.norm(nll_g.reshape(-1)) / (
            jnp.linalg.norm(gan_g.reshape(-1)) + 1e-4
        )
        d_weight = jax.lax.stop_gradient(
            jnp.clip(d_weight, 0.0, 1e4) * cfg.disc_weight
        )
    else:
        d_weight = jnp.asarray(0.0)

    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    loss = nll_loss + d_weight * disc_factor * g_loss + cfg.kl_weight * kl
    log = {
        "loss/total_loss": loss, "loss/nll_loss": nll_loss,
        "loss/rec_loss": rec_loss, "loss/kl_loss": kl,
        "loss/g_loss": g_loss, "loss/d_weight": d_weight,
        "loss/logvar": logvar,
    }
    return loss, log


def discriminator_loss(
    cfg: VAEGanLossConfig,
    vae,
    disc,
    vae_params,
    disc_vars: Dict[str, Any],
    x: Array,
    rng: Array,
    global_step: Array,
    train_bn: bool = True,
):
    """optimizer_idx=1 branch (losses/__init__.py:230-246)."""
    from ..models.vae import AutoencoderKL, DiagonalGaussian

    moments = vae.apply(vae_params, x, method=AutoencoderKL.encode_moments)
    z = DiagonalGaussian(moments).sample(rng)
    xrec = jax.lax.stop_gradient(
        vae.apply(vae_params, z, method=AutoencoderKL.decode)
    )

    d_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

    def run(variables, inp):
        if train_bn and "batch_stats" in variables:
            out, updates = disc.apply(
                variables, inp, train=True, mutable=["batch_stats"]
            )
            return out, updates
        return disc.apply(variables, inp, train=False), {}

    logits_real, upd1 = run(disc_vars, x)
    logits_fake, upd2 = run({**disc_vars, **upd1}, xrec)
    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    d_loss = disc_factor * d_fn(logits_real, logits_fake)
    log = {
        "loss/disc_loss": d_loss,
        "loss/logits_real": jnp.mean(logits_real),
        "loss/logits_fake": jnp.mean(logits_fake),
    }
    return d_loss, log, upd2


def make_vae_train_steps(
    cfg: VAEGanLossConfig,
    vae,
    disc,
    ae_optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    perceptual_fn: Optional[Callable] = None,
):
    """(ae_step, disc_step): the two jitted halves of the reference's
    alternating optimizer loop (autoencoder.py:182-214). State dicts:
      ae_state   = {params (vae), logvar, opt_state, step}
      disc_state = {vars (params+batch_stats), opt_state}
    """

    @jax.jit
    def ae_step(ae_state, disc_state, x, rng):
        def loss_fn(p, logvar):
            return generator_loss(
                cfg, vae, disc, p, disc_state["vars"], logvar, x, rng,
                ae_state["step"], perceptual_fn,
            )

        (loss, log), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            ae_state["params"], ae_state["logvar"]
        )
        updates, opt_state = ae_optimizer.update(
            grads[0], ae_state["opt_state"], ae_state["params"]
        )
        new_params = optax.apply_updates(ae_state["params"], updates)
        return {
            "params": new_params,
            "logvar": ae_state["logvar"],  # learn_logvar False by default
            "opt_state": opt_state,
            "step": ae_state["step"] + 1,
        }, loss, log

    @jax.jit
    def disc_step(ae_state, disc_state, x, rng):
        def loss_fn(variables):
            d_loss, log, upd = discriminator_loss(
                cfg, vae, disc, ae_state["params"],
                {**disc_state["vars"], "params": variables}, x, rng,
                ae_state["step"],
            )
            return d_loss, (log, upd)

        (d_loss, (log, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_state["vars"]["params"]
        )
        updates, opt_state = disc_optimizer.update(
            grads, disc_state["opt_state"], disc_state["vars"]["params"]
        )
        new_params = optax.apply_updates(disc_state["vars"]["params"], updates)
        new_vars = {**disc_state["vars"], "params": new_params, **upd}
        return {"vars": new_vars, "opt_state": opt_state}, d_loss, log

    return ae_step, disc_step
