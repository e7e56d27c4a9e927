"""Training orchestration: loader -> jitted step -> checkpoints -> eval.

The single-host replacement for the reference's mp.spawn + DDP process loop
(reference: train_control_var_hpu.py:536-689): one process drives all local
devices through SPMD sharding; multi-host runs add jax.distributed.initialize
and shard the batch by process index (data/build.Loader shard args).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from controlvar_tpu.config import ControlVARConfig, OptimConfig, VQVAEConfig
from controlvar_tpu.ckpt.orbax_io import CheckpointIO
from controlvar_tpu.data.build import Loader
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.parallel.distributed import form_global_batch, is_primary
from controlvar_tpu.parallel.mesh import make_mesh, param_shardings
from controlvar_tpu.train.train_step import (
    ControlVARTrainStep,
    TrainState,
    init_train_state,
)


def opt_state_shardings(mesh, opt_state, params, p_sh):
    """Sharding tree for an optimizer state: any sub-tree with the params'
    structure (Adam mu/nu moments) follows the PARAM shardings; everything
    else (hyperparams, counts) is replicated. Works on abstract
    (ShapeDtypeStruct) trees too — used by the d30 AOT memory analysis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    pdef = jax.tree_util.tree_structure(params)

    def rec(node):
        if jax.tree_util.tree_structure(node) == pdef:
            return p_sh
        if isinstance(node, dict):
            return type(node)({k: rec(v) for k, v in node.items()})
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        if hasattr(node, "shape"):
            return repl
        return node

    return rec(opt_state)


def shard_opt_state(mesh, opt_state, params, p_sh):
    """device_put the optimizer state per opt_state_shardings. Under TP this
    is what keeps the 2x-params Adam state from being replicated on every
    chip (a d30 run would otherwise carry ~16 GB of redundant moments per
    device)."""
    sh = opt_state_shardings(mesh, opt_state, params, p_sh)

    def put(node, s):
        return jax.device_put(node, s) if hasattr(node, "shape") else node

    return jax.tree_util.tree_map(put, opt_state, sh)


@dataclasses.dataclass
class Trainer:
    model_cfg: ControlVARConfig
    vq_cfg: VQVAEConfig
    optim: OptimConfig
    loader: Loader
    vq_params: Dict
    ckpt_dir: Optional[str] = None
    model_axis: int = 1
    lora_rank: int = 0   # >0: LoRA fine-tune — only (A, B) factors train
                         # (reference: train_control_var_hpu.py:449-470)
    from_tokens: bool = False  # loader yields PRE-TOKENIZED batches
                               # (data/shards.TokenShardLoader): the step skips
                               # both frozen VQVAE encoder passes — a
                               # TPU-friendly accelerant the reference lacks
    log_every: int = 50
    save_every_steps: Optional[int] = None
    stop_after: Optional[int] = None  # checkpoint-and-exit after N steps
                                      # WITHOUT touching the lr horizon
                                      # (preemption simulation / timeboxing)
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 10-13
    log_fn: Callable[[Dict], None] = lambda m: print(
        " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in m.items()),
        flush=True,
    )

    def __post_init__(self):
        if self.from_tokens and self.model_cfg.bidirectional:
            # pretokenize stores only the mask-first ignore order
            # (data/shards.write_token_shard); the image-first coin flip
            # would mis-weight the loss — use the pixel path for that recipe
            raise ValueError(
                "from_tokens does not support bidirectional training: token "
                "shards carry only the mask-first ignore_mask order"
            )
        self.model = ControlVARModel(self.model_cfg)
        self.vqvae = VQVAE(self.vq_cfg)
        n_dev = len(jax.devices())
        self.mesh = make_mesh(data=n_dev // self.model_axis, model=self.model_axis)
        self.steps_per_epoch = self.loader.steps_per_epoch()
        self.max_steps = self.optim.epochs * self.steps_per_epoch
        warmup = max(1, int(self.optim.warmup_init_frac * self.max_steps))
        self.stepper = ControlVARTrainStep(
            self.model, self.vqvae, self.optim, self.max_steps, warmup
        )
        self.io = CheckpointIO(self.ckpt_dir) if self.ckpt_dir else None

    def set_max_steps(self, max_steps: int):
        """Cap the training horizon (e.g. `--steps` smoke runs). Must be
        called BEFORE init_state: it rebuilds the stepper so the in-graph
        lr/wd schedule anneals over the capped horizon, not epochs*spe."""
        self.max_steps = max_steps
        warmup = max(1, int(self.optim.warmup_init_frac * max_steps))
        self.stepper = ControlVARTrainStep(
            self.model, self.vqvae, self.optim, max_steps, warmup
        )

    # ---- state -------------------------------------------------------------

    def init_state(self, seed: int = 0,
                   base_params: Optional[Dict] = None) -> TrainState:
        """base_params: pretrained weights (e.g. converted .pth after VAR
        surgery). With lora_rank > 0 they become the frozen LoRA base and the
        TrainState holds only the (A, B) factors."""
        params = base_params or self.model.init_params(jax.random.key(seed))
        if self.lora_rank > 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from controlvar_tpu.ckpt.lora import LoRAConfig
            from controlvar_tpu.train.train_step import LoRAControlVARTrainStep

            lora_cfg = LoRAConfig(rank=self.lora_rank)
            lora_stepper = LoRAControlVARTrainStep(self.stepper, lora_cfg)
            p_sh = param_shardings(self.mesh, params)
            self._base_params = jax.device_put(params, p_sh)
            state, self.tx = lora_stepper.init_lora_state(
                jax.random.key(seed + 1), params, self.optim
            )
            repl = NamedSharding(self.mesh, P())
            state = state._replace(
                params=jax.device_put(
                    state.params,
                    jax.tree_util.tree_map(lambda _: repl, state.params),
                )
            )
            self._step_fn = jax.jit(
                lambda s, bp, vp, b, k, mf: lora_stepper.step(
                    self.tx, s, bp, vp, b, k, mf,
                    from_tokens=self.from_tokens,
                ),
                static_argnums=(5,),
            )
            return state
        state, self.tx = init_train_state(params, self.optim)
        p_sh = param_shardings(self.mesh, state.params)
        state = state._replace(
            params=jax.device_put(state.params, p_sh),
            opt_state=shard_opt_state(self.mesh, state.opt_state, state.params, p_sh),
        )
        self._step_fn = jax.jit(
            lambda s, vp, b, k, mf: self.stepper.step(
                self.tx, s, vp, b, k, mf, from_tokens=self.from_tokens,
                accum=self.optim.grad_accum,
            ),
            static_argnums=(4,),
        )
        return state

    def maybe_resume(self, state: TrainState):
        if self.io is None:
            return state, 0
        restored, meta = self.io.restore(state)
        if restored is None:
            return state, 0
        # re-apply mesh shardings: orbax brings leaves back COMMITTED to a
        # single device, which the mesh-jitted step rejects. Template leaves
        # without a mesh sharding (e.g. the scalar step counter, built
        # uncommitted by init_state) are replicated over the mesh.
        from jax.sharding import NamedSharding, PartitionSpec

        def _sharding(x):
            s = x.sharding
            return s if getattr(s, "mesh", None) is not None else (
                NamedSharding(self.mesh, PartitionSpec()))

        restored = jax.device_put(
            restored, jax.tree_util.tree_map(_sharding, state))
        return restored, (meta or {}).get("epoch", 0)

    # ---- loop --------------------------------------------------------------

    def fit_with_recovery(self, state: TrainState, start_epoch: int = 0,
                          max_restarts: int = 3) -> TrainState:
        """Crash-restart wrapper: on a transient device/runtime failure,
        restore the latest checkpoint and continue (the reference only has
        this commented out, train_control_var_hpu.py:702-708)."""
        restarts = 0
        while True:
            try:
                return self.fit(state, start_epoch)
            except (RuntimeError, OSError) as e:
                restarts += 1
                if self.io is None or restarts > max_restarts:
                    raise
                print(f"[recovery] {type(e).__name__}: {e}; restart "
                      f"{restarts}/{max_restarts} from latest checkpoint",
                      flush=True)
                restored, meta = self.io.restore(state)
                if restored is not None:
                    state = restored
                    start_epoch = (meta or {}).get("epoch", start_epoch)

    def fit(self, state: TrainState, start_epoch: int = 0,
            mask_first_sampler: Optional[Callable[[int], bool]] = None) -> TrainState:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(self.mesh, P("data"))
        vq_params = jax.device_put(
            self.vq_params,
            jax.tree_util.tree_map(lambda _: NamedSharding(self.mesh, P()), self.vq_params),
        )
        profiler = None
        if self.profile_dir:
            from controlvar_tpu.utils.tracker import StepProfiler

            profiler = StepProfiler(self.profile_dir)
        rng = np.random.default_rng(1234)
        # host-side step counter: reading state.step would force a device
        # sync every step and stall the dispatch pipeline
        step_i = int(jax.device_get(state.step))
        spe = self.loader.steps_per_epoch()
        with self.mesh:
            for epoch in range(start_epoch, self.optim.epochs):
                t_last = time.time()
                # mid-epoch resume: a restored step count inside this epoch
                # skips the already-consumed prefix (deterministic per-epoch
                # shuffle) instead of re-training it
                skip = min(spe, max(0, step_i - epoch * spe))
                stop = (min(self.max_steps, self.stop_after)
                        if self.stop_after else self.max_steps)
                for batch in self.loader.epoch(epoch, skip_batches=skip):
                    if step_i >= stop:
                        break
                    # bidirectional: coin flip per step (reference :193-202)
                    mask_first = True
                    if self.model_cfg.bidirectional and (
                        mask_first_sampler(step_i) if mask_first_sampler
                        else rng.random() < 0.5
                    ):
                        mask_first = False
                    if self.from_tokens:
                        # pre-tokenized batch (TokenShardLoader): per-scale id
                        # lists instead of pixels; ignore_mask is optional and
                        # always mask-first order (enforced in __post_init__)
                        dev_batch = {
                            "ctrl_ids": batch["ctrl_ids"],
                            "img_ids": batch["img_ids"],
                            "cls": batch["cls"], "type": batch["type"],
                        }
                        if "ignore_mask" in batch:
                            dev_batch["ignore_mask"] = batch["ignore_mask"]
                    else:
                        dev_batch = {
                            "image": batch["image"], "mask": batch["mask"],
                            "cls": batch["cls"], "type": batch["type"],
                            "ignore_mask": batch["ignore_mask" if mask_first else "ignore_mask_"],
                        }
                    dev_batch = form_global_batch(batch_sh, dev_batch)
                    if profiler is not None:
                        profiler.step(step_i)
                    if self.lora_rank > 0:
                        state, metrics = self._step_fn(
                            state, self._base_params, vq_params, dev_batch,
                            jax.random.key(step_i), mask_first,
                        )
                    else:
                        state, metrics = self._step_fn(
                            state, vq_params, dev_batch,
                            jax.random.key(step_i), mask_first,
                        )
                    if step_i % self.log_every == 0 and is_primary():
                        # metrics are replicated; only the primary host logs
                        # (reference: rank-0 wandb, train_control_var_hpu.py:257)
                        m = {k: float(v) for k, v in metrics.items()}
                        m.update(step=step_i, epoch=epoch,
                                 sec_per_step=(time.time() - t_last) / self.log_every)
                        t_last = time.time()
                        self.log_fn(m)
                    if (
                        self.io is not None
                        and self.save_every_steps
                        and step_i > 0
                        and step_i % self.save_every_steps == 0
                    ):
                        self.io.save(step_i, state, metadata={"epoch": epoch})
                    step_i += 1
                if self.io is not None:
                    # a max_steps cap can stop MID-epoch: record the current
                    # epoch then, so resume skips only the consumed prefix
                    # instead of starting the next epoch
                    ep_meta = epoch + 1 if step_i >= (epoch + 1) * spe else epoch
                    self.io.save(int(state.step), state,
                                 metadata={"epoch": ep_meta})
                if step_i >= stop:
                    break
        if self.io is not None:
            self.io.wait()
        return state
