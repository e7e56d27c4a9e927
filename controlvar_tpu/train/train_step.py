"""Jitted training steps for VAR and ControlVAR.

One XLA program per optimizer step: frozen-VQVAE tokenization (2 encoder
passes), scale-interleaving, teacher-forced transformer forward, masked
cross-entropy, global-norm clip, AdamW with in-graph lr/wd annealing.
Mirrors the reference train_epoch body (reference:
train_control_var_hpu.py:130-250) but with everything fused under jit and
gradient reduction done by XLA collectives from shardings (no DDP).

Batch dict contract (all device arrays):
  image  (B, 256, 256, 3) in [-1, 1]
  mask   (B, 256, 256, 3) in [-1, 1]   # the rendered condition image
  cls    (B,) int32
  type   (B,) int32                     # cond type id, multi_cond only
  ignore_mask (B, L) float32 optional   # loss weighting
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from controlvar_tpu.config import ControlVARConfig, OptimConfig, VARConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.var import VARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.lr_schedule import lr_wd_at_step
from controlvar_tpu.train.param_groups import weight_decay_mask

Params = Dict


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32


def make_optimizer(optim: OptimConfig, params: Params) -> optax.GradientTransformation:
    """AdamW with decay mask; lr/wd injected per step inside the train step
    (reference: AdamW β=(0.9,0.95) lr=base*bs/512, train_control_var_hpu.py:631-633)."""
    mask = weight_decay_mask(params)
    return optax.inject_hyperparams(
        lambda learning_rate, weight_decay: optax.chain(
            optax.clip_by_global_norm(optim.grad_clip),
            optax.scale_by_adam(b1=optim.beta1, b2=optim.beta2),
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=optim.lr, weight_decay=optim.weight_decay)


def init_train_state(params: Params, optim: OptimConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(optim, params)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def interleave_tokens(
    ctrl_ids, img_ids, ctrl_h, img_h, mask_first: bool = True,
    separator: bool = False, vocab_size: int = 0,
):
    """Per-scale interleave of (control, image) streams
    (reference: train_control_var_hpu.py:191-204).

    ctrl_ids/img_ids: lists of (B, pn^2) ids for all S scales.
    ctrl_h/img_h: lists of (B, pn'^2, Cvae) teacher-forcing features, S-1 long.
    separator: insert separator-class targets (mapping index + vocab_size)
    after every non-first-scale segment so labels align with forward_train's
    separator-spliced sequence (reference: train_control_var_hpu.py:216-228).
    Returns (labels (B, L), x_tf (B, L_words - first_l, Cvae)); x_tf never
    carries separator slots (forward_train splices the learned embeddings).
    """
    a_ids, b_ids = (ctrl_ids, img_ids) if mask_first else (img_ids, ctrl_ids)
    a_h, b_h = (ctrl_h, img_h) if mask_first else (img_h, ctrl_h)
    parts = [t for pair in zip(a_ids, b_ids) for t in pair]
    if separator:
        from controlvar_tpu.models.control_var import separator_mapping

        mapping = separator_mapping(mask_first)
        B = parts[0].shape[0]
        with_sep = parts[:2]
        for i, part in enumerate(parts[2:]):
            sp = jnp.full((B, 1), mapping[i] + vocab_size, part.dtype)
            with_sep.extend([part, sp])
        parts = with_sep
    labels = jnp.concatenate(parts, axis=1)
    x_tf = jnp.concatenate([t for pair in zip(a_h, b_h) for t in pair], axis=1)
    return labels, x_tf


def splice_separator_ones(ign: jnp.ndarray, patch_nums) -> jnp.ndarray:
    """Insert weight-1 columns at separator slots so a separator-free
    ignore mask (B, 2*sum(pn^2)) aligns with separator-spliced labels
    (reference emits the spliced mask from the dataset itself,
    datasets/imagenetC.py:152-183; our datasets stay model-agnostic)."""
    B = ign.shape[0]
    parts = []
    off = 0
    for pn in patch_nums:
        for _ in range(2):
            parts.append(ign[:, off:off + pn * pn])
            off += pn * pn
    # separator insertion mirrors interleave_tokens: the first two segments
    # (scale-0 pair) carry no separators; every later segment is followed
    # by one separator column.
    out = parts[:2]
    one = jnp.ones((B, 1), ign.dtype)
    for p in parts[2:]:
        out.extend([p, one])
    return jnp.concatenate(out, axis=1)


def _aligned_ignore(cfg, ign: Optional[jnp.ndarray],
                    target_len: int) -> Optional[jnp.ndarray]:
    """Align a dataset ignore mask with the label layout: splice weight-1
    separator columns iff the model uses separators and the mask is
    separator-free (single definition — the splice condition must match
    between the loss and the grad-accum global denominator)."""
    if ign is None or not cfg.separator or ign.shape[1] == target_len:
        return ign
    return splice_separator_ones(ign, cfg.patch_nums)


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               ignore: Optional[jnp.ndarray],
               denom: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CE(reduction=none) with ignore-mask weighting
    (reference: train_control_var_hpu.py:228-239).

    `denom` overrides the weight-sum denominator: the grad-accum scan passes
    the GLOBAL big-batch weight sum (divided by accum) so that averaging the
    per-microbatch losses reproduces the exact global weighted mean even when
    microbatches carry unequal ignore-mask weight."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if ignore is None:
        return jnp.mean(nll)
    w = ignore.astype(jnp.float32)
    if denom is None:
        denom = jnp.sum(w) + 1e-6 * float(w.size)
    return jnp.sum(nll * w) / denom


@dataclasses.dataclass(frozen=True)
class ControlVARTrainStep:
    """Factory for the fused ControlVAR train step."""

    model: ControlVARModel
    vqvae: VQVAE
    optim: OptimConfig
    max_steps: int
    warmup_steps: int
    tokenize_dtype = jnp.bfloat16

    def loss_fn(self, params, vq_params, batch, key, mask_first=True,
                loss_denom=None):
        cfg = self.model.cfg
        vq = self.vqvae
        # 1. frozen tokenization under bf16 (reference: hpu autocast :157-167)
        stop = jax.lax.stop_gradient
        ctrl_ids = vq.img_to_ids(vq_params, batch["mask"], compute_dtype=self.tokenize_dtype)
        img_ids = vq.img_to_ids(vq_params, batch["image"], compute_dtype=self.tokenize_dtype)
        ctrl_ids = [stop(t) for t in ctrl_ids]
        img_ids = [stop(t) for t in img_ids]
        ctrl_h = [stop(t) for t in vq.ids_to_var_input(vq_params, ctrl_ids)]
        img_h = [stop(t) for t in vq.ids_to_var_input(vq_params, img_ids)]
        labels_tok, x_tf = interleave_tokens(
            ctrl_ids, img_ids, ctrl_h, img_h, mask_first,
            separator=cfg.separator, vocab_size=cfg.vocab_size,
        )
        # 2. forward + loss
        logits = self.model.forward_train(
            params, batch["cls"], x_tf,
            cond_type=batch.get("type"), mask_first=mask_first,
            key=key, train=True,
        )
        ign = _aligned_ignore(cfg, batch.get("ignore_mask"),
                              labels_tok.shape[1])
        loss = _masked_ce(logits, labels_tok, ign, loss_denom)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels_tok).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    def loss_fn_tokens(self, params, vq_params, batch, key, mask_first=True,
                       loss_denom=None):
        """Variant over PRE-TOKENIZED batches (offline tokenization shards,
        data/shards.py): skips the two VQVAE encoder passes per step; only the
        cheap ids->teacher-forcing features remain on the accelerator.

        batch: {ctrl_ids: [per-scale (B, pn^2)], img_ids: [...], cls, type,
        ignore_mask?}.
        """
        vq = self.vqvae
        stop = jax.lax.stop_gradient
        ctrl_ids = [stop(t) for t in batch["ctrl_ids"]]
        img_ids = [stop(t) for t in batch["img_ids"]]
        ctrl_h = [stop(t) for t in vq.ids_to_var_input(vq_params, ctrl_ids)]
        img_h = [stop(t) for t in vq.ids_to_var_input(vq_params, img_ids)]
        labels_tok, x_tf = interleave_tokens(
            ctrl_ids, img_ids, ctrl_h, img_h, mask_first,
            separator=self.model.cfg.separator,
            vocab_size=self.model.cfg.vocab_size,
        )
        logits = self.model.forward_train(
            params, batch["cls"], x_tf,
            cond_type=batch.get("type"), mask_first=mask_first,
            key=key, train=True,
        )
        ign = _aligned_ignore(self.model.cfg, batch.get("ignore_mask"),
                              labels_tok.shape[1])
        loss = _masked_ce(logits, labels_tok, ign, loss_denom)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels_tok).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    def step(self, tx, state: TrainState, vq_params, batch, key,
             mask_first: bool = True, from_tokens: bool = False,
             accum: int = 1):
        """One optimizer step; accum > 1 runs a jit-internal microbatch scan
        (reference flag: train_control_var_hpu.py:65,249) — the update matches
        the single-big-batch step exactly, including under ignore-mask
        reweighting: each microbatch loss is normalized by the GLOBAL weight
        sum (computed upfront from the batch's ignore mask) divided by accum,
        so the averaged microbatch losses/grads equal the global weighted
        mean. Peak activation memory drops by ~accum×."""
        lr, wd = lr_wd_at_step(
            self.optim.schedule, state.step, self.optim.lr,
            self.optim.weight_decay, self.optim.wd_end,
            self.warmup_steps, self.max_steps,
            wp0=self.optim.warmup_init_frac,
        )
        loss_fn = self.loss_fn_tokens if from_tokens else self.loss_fn
        if accum <= 1:
            (loss, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, vq_params, batch, key, mask_first), has_aux=True
            )(state.params)
        else:
            mb_batch = jax.tree_util.tree_map(
                lambda a: a.reshape((accum, a.shape[0] // accum) + a.shape[1:]),
                batch,
            )
            keys = jax.random.split(key, accum)
            ign = _aligned_ignore(self.model.cfg, batch.get("ignore_mask"),
                                  self.model.cfg.seq_len)
            # global weighted-mean normalization: W is a pure input, so it is
            # known before the scan; per-microbatch denom W/accum makes the
            # mean over microbatches equal sum(nll*w)/W exactly
            denom = (
                None if ign is None
                else (jnp.sum(ign.astype(jnp.float32))
                      + 1e-6 * float(ign.size)) / accum
            )

            def body(carry, xs):
                g_sum, aux_sum = carry
                mb, k = xs
                (_, aux_i), g_i = jax.value_and_grad(
                    lambda p: loss_fn(p, vq_params, mb, k, mask_first,
                                      loss_denom=denom),
                    has_aux=True,
                )(state.params)
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g_i)
                aux_sum = jax.tree_util.tree_map(jnp.add, aux_sum, aux_i)
                return (g_sum, aux_sum), None

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            aux0 = {"loss": jnp.zeros(()), "acc": jnp.zeros(())}
            (g_sum, aux_sum), _ = jax.lax.scan(body, (g0, aux0), (mb_batch, keys))
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            aux = jax.tree_util.tree_map(lambda a: a / accum, aux_sum)
            loss = aux["loss"]
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = wd
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux, lr=lr, wd=wd, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_opt, state.step + 1), aux


@dataclasses.dataclass(frozen=True)
class LoRAControlVARTrainStep:
    """LoRA fine-tuning step: differentiates ONLY the LoRA (A, B) tree; the
    frozen base weights are merged on the fly (reference peft path:
    train_control_var_hpu.py:449-470). TrainState.params holds the LoRA tree."""

    base: ControlVARTrainStep
    lora_cfg: "object"  # ckpt.lora.LoRAConfig

    def init_lora_state(self, key, base_params, optim: OptimConfig):
        from controlvar_tpu.ckpt.lora import init_lora_params

        lora = init_lora_params(key, base_params, self.lora_cfg)
        tx = optax.inject_hyperparams(
            lambda learning_rate, weight_decay: optax.chain(
                optax.clip_by_global_norm(optim.grad_clip),
                optax.scale_by_adam(b1=optim.beta1, b2=optim.beta2),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_learning_rate(learning_rate),
            )
        )(learning_rate=optim.lr, weight_decay=optim.weight_decay)
        return TrainState(lora, tx.init(lora), jnp.zeros((), jnp.int32)), tx

    def step(self, tx, state: TrainState, base_params, vq_params, batch, key,
             mask_first: bool = True, from_tokens: bool = False):
        from controlvar_tpu.ckpt.lora import apply_lora

        optim = self.base.optim
        lr, wd = lr_wd_at_step(
            optim.schedule, state.step, optim.lr, optim.weight_decay,
            optim.wd_end, self.base.warmup_steps, self.base.max_steps,
            wp0=optim.warmup_init_frac,
        )
        loss_fn = self.base.loss_fn_tokens if from_tokens else self.base.loss_fn
        (loss, aux), grads = jax.value_and_grad(
            lambda lp: loss_fn(
                apply_lora(base_params, lp, self.lora_cfg), vq_params, batch,
                key, mask_first,
            ),
            has_aux=True,
        )(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = wd
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux, lr=lr, wd=wd, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_opt, state.step + 1), aux


@dataclasses.dataclass(frozen=True)
class VARTrainStep:
    """Plain-VAR variant (reference: train_var_hpu.py:121-206)."""

    model: VARModel
    vqvae: VQVAE
    optim: OptimConfig
    max_steps: int
    warmup_steps: int
    tokenize_dtype = jnp.bfloat16

    def loss_fn(self, params, vq_params, batch, key):
        vq = self.vqvae
        stop = jax.lax.stop_gradient
        ids = [stop(t) for t in vq.img_to_ids(vq_params, batch["image"],
                                              compute_dtype=self.tokenize_dtype)]
        h = [stop(t) for t in vq.ids_to_var_input(vq_params, ids)]
        labels_tok = jnp.concatenate(ids, axis=1)
        x_tf = jnp.concatenate(h, axis=1)
        logits = self.model.forward_train(params, batch["cls"], x_tf, key=key, train=True)
        loss = _masked_ce(logits, labels_tok, batch.get("ignore_mask"))
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels_tok).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    def step(self, tx, state: TrainState, vq_params, batch, key):
        lr, wd = lr_wd_at_step(
            self.optim.schedule, state.step, self.optim.lr,
            self.optim.weight_decay, self.optim.wd_end,
            self.warmup_steps, self.max_steps,
            wp0=self.optim.warmup_init_frac,
        )
        (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, vq_params, batch, key
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        opt_state.hyperparams["weight_decay"] = wd
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        aux = dict(aux, lr=lr, wd=wd, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_opt, state.step + 1), aux
