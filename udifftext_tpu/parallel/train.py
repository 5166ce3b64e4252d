"""Training system: masked optimizer, grad accumulation, data-parallel step.

Parity with the reference training semantics:
  - **Selective trainability** (sgm/models/diffusion.py:202-218): only UNet
    params whose path contains one of `opt_keys` (t_attn, t_norm) receive
    updates; everything else (VAE, LabelEncoder, rest of the UNet) is frozen.
    In JAX this is `optax.masked` — the DDP `find_unused_parameters` crutch
    is unnecessary.
  - AdamW + per-epoch ×0.95 LambdaLR (diffusion.py:219-221).
  - Grad accumulation ×4 (configs/train.yaml:21) as a `lax.scan` over
    microbatches inside one jitted step.
  - Data parallelism: batch sharded over the mesh `data` axis, params
    replicated; XLA emits the gradient all-reduce (replaces Lightning DDP).
  - EMA shadow params (sgm/modules/ema.py) as a pytree lerp.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def trainable_mask(
    params,
    opt_keys: Tuple[str, ...],
    trainable_top=("unet",),
    trainable_embedders: Tuple[str, ...] = (),
):
    """Pytree of bools: True where the param path contains an opt_key and the
    top-level collection is trainable (reference trains only the UNet).
    Embedders listed in `trainable_embedders` (per-embedder is_trainable,
    modules.py:118-124) are fully trainable under params["embedders"]."""

    def mask_leaf(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if len(keys) >= 2 and keys[0] == "embedders":
            return keys[1] in trainable_embedders
        if keys and keys[0] not in trainable_top:
            return False
        return any(any(k in str(seg) for seg in keys) for k in opt_keys)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def epoch_decay_schedule(base_lr: float, steps_per_epoch: int, decay: float = 0.95):
    """lr(step) = base_lr * decay^epoch (diffusion.py:220)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.power(decay, epoch)

    return schedule


def make_optimizer(
    params,
    base_lr: float = 5e-5,
    opt_keys: Tuple[str, ...] = ("t_attn", "t_norm"),
    steps_per_epoch: int = 1000,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    trainable_embedders: Tuple[str, ...] = (),
) -> optax.GradientTransformation:
    mask = trainable_mask(params, opt_keys, trainable_embedders=trainable_embedders)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    opt = optax.adamw(
        learning_rate=epoch_decay_schedule(base_lr, steps_per_epoch),
        b1=b1, b2=b2, weight_decay=weight_decay,
    )
    # multi_transform + set_to_zero hard-freezes non-opt_key params
    # (optax.masked alone would pass raw gradients through for them)
    return optax.multi_transform({"train": opt, "freeze": optax.set_to_zero()}, labels)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, optimizer, use_ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            ema_params=jax.tree.map(lambda x: x, params) if use_ema else None,
        )


def ema_update(ema_params, params, step, decay: float = 0.9999):
    """LitEma warmup decay: min(decay, (1+n)/(10+n)) (sgm/modules/ema.py)."""
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)


def swa_update(avg_params, params, n_avg):
    """Stochastic weight averaging: equal-weight running mean over the
    snapshots seen so far — avg_{n+1} = avg_n + (p - avg_n) / (n + 1).

    The reference wires Lightning's StochasticWeightAveraging(swa_epoch_start
    =0.75) into the PARSeq trainer (/root/reference/src/parseq/train.py:69);
    this is the pytree equivalent the STR trainer applies over the tail
    fraction of training. n_avg is how many snapshots are ALREADY in avg
    (0 → the update returns `params` itself); it may be a python int or a
    traced scalar (pass a scalar array under jit so the count does not bake
    into the executable and force a retrace per step)."""
    w = 1.0 / (n_avg + 1.0)
    return jax.tree.map(lambda a, p: a + (p - a) * w, avg_params, params)


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, Any], jax.Array], Tuple[jax.Array, Dict]],
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
    use_ema: bool = False,
    ema_decay: float = 0.9999,
    donate: bool = True,
    mesh: Optional[Mesh] = None,
    state_sharding_tree: Optional[Any] = None,
):
    """Build the jitted train step.

    The batch's leading dim must be (accum_steps * per_step_batch); grads are
    averaged over microbatches via lax.scan before one optimizer update —
    matching accumulate_grad_batches semantics.

    `state_sharding_tree` (see parallel/sharding.state_shardings) opts into
    megatron-style tensor parallelism: a NamedSharding pytree matching the
    TrainState; without it params replicate (pure DP, the reference's DDP
    semantics).

    Frozen-param gradients need no explicit pruning: their grads feed
    `set_to_zero` in the masked optimizer and nothing else, so XLA dead-code
    -eliminates the frozen weight-gradient matmuls (incl. the entire VAE
    -encoder backward) on its own — the jit-level analogue of the torch
    reference's requires_grad=False (diffusion.py:202-218). An explicit
    stop_gradient wrapper over frozen leaves was measured ACTIVELY HARMFUL
    here: 1.6 → 3.6 s/step on the full fine-tune graph (B=16, ROOFLINE.md
    "Training step" section) — it perturbs partial-eval/fusion for zero
    algorithmic benefit. Don't add it back.
    """

    grad_fn = jax.value_and_grad(
        lambda p, b, r: loss_fn(p, b, r), has_aux=True
    )

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        if accum_steps == 1:
            (loss, aux), grads = grad_fn(state.params, batch, rng)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, accum_steps)

            def accum(carry, xs):
                g_sum, loss_sum = carry
                mb, r = xs
                (l, a), g = grad_fn(state.params, mb, r)
                return (
                    jax.tree.map(jnp.add, g_sum, g),
                    loss_sum + l,
                ), a

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, loss_sum), aux_stack = jax.lax.scan(
                accum, (zero_g, 0.0), (micro, rngs)
            )
            grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
            loss = loss_sum / accum_steps
            # mean of each aux component over microbatches — the reference
            # logs every loss component each step (diffusion.py:151-171)
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), aux_stack)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            ema_update(state.ema_params, new_params, state.step, ema_decay)
            if use_ema and state.ema_params is not None
            else state.ema_params
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, loss, aux

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    state_sh = repl if state_sharding_tree is None else state_sharding_tree
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


# ---------------------------------------------------------------------------
# LR schedulers (sgm/lr_scheduler.py capability surface — warmup-cosine and
# linear variants; the engine default remains the 0.95^epoch decay)
# ---------------------------------------------------------------------------


def warmup_cosine_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    lr_min: float = 0.0,
    lr_start: float = 0.0,
):
    """LambdaWarmUpCosineScheduler semantics: linear warmup from lr_start to
    base_lr, then cosine decay to lr_min."""
    import jax.numpy as jnp

    def schedule(step):
        warm = lr_start + (base_lr - lr_start) * step / jnp.maximum(warmup_steps, 1)
        t = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_cosine_cycles_schedule(
    warm_up_steps,
    f_min,
    f_max,
    f_start,
    cycle_lengths,
    linear: bool = False,
):
    """LambdaWarmUpCosineScheduler2 / LambdaLinearScheduler semantics
    (sgm/lr_scheduler.py:51-135): repeated cycles with per-cycle warmup /
    min / max / start multipliers, cosine (or linear) decay inside each
    cycle. Returns an lr-multiplier schedule (use with base lr 1.0, like the
    reference). jit-safe: cycle lookup via searchsorted over static tables."""
    import numpy as np

    warm = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    lengths = jnp.asarray(cycle_lengths, jnp.float32)
    cum = jnp.asarray(np.cumsum([0] + list(cycle_lengths)), jnp.float32)

    def schedule(step):
        n_global = jnp.asarray(step, jnp.float32)
        cycle = jnp.clip(
            jnp.searchsorted(cum[1:], n_global, side="left"), 0, len(cycle_lengths) - 1
        )
        n = n_global - cum[cycle]
        w, lo, hi, st, ln = warm[cycle], fmin[cycle], fmax[cycle], fstart[cycle], lengths[cycle]
        warm_f = (hi - st) / jnp.maximum(w, 1.0) * n + st
        if linear:
            decay_f = lo + (hi - lo) * (ln - n) / ln
        else:
            t = jnp.minimum((n - w) / jnp.maximum(ln - w, 1.0), 1.0)
            decay_f = lo + 0.5 * (hi - lo) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < w, warm_f, decay_f)

    return schedule


def warmup_linear_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    lr_min: float = 0.0,
    lr_start: float = 0.0,
):
    """LambdaLinearScheduler semantics: linear warmup then linear decay."""
    import jax.numpy as jnp

    def schedule(step):
        warm = lr_start + (base_lr - lr_start) * step / jnp.maximum(warmup_steps, 1)
        t = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        lin = base_lr + (lr_min - base_lr) * t
        return jnp.where(step < warmup_steps, warm, lin)

    return schedule
