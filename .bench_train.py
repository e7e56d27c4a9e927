import time, jax, jax.numpy as jnp
from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth, OptimConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.train.train_step import ControlVARTrainStep, init_train_state

cfg = control_var_config_from_depth(16, multi_cond=True, drop_path_rate=0.1*16/24)
vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
model = ControlVARModel(cfg)
params = model.init_params(jax.random.key(1))
optim = OptimConfig(total_batch_size=8)
state, tx = init_train_state(params, optim)
stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=1000, warmup_steps=10)
B = 8
batch = {
    "image": jax.random.uniform(jax.random.key(2), (B,256,256,3), jnp.float32, -1, 1),
    "mask": jax.random.uniform(jax.random.key(3), (B,256,256,3), jnp.float32, -1, 1),
    "cls": jnp.zeros((B,), jnp.int32),
    "type": jnp.zeros((B,), jnp.int32),
}
step = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))
t0=time.time()
state, m = step(state, vq_params, batch, jax.random.key(4))
l = float(m["loss"])
print(f"compile+first: {time.time()-t0:.1f}s loss={l:.3f}", flush=True)
t0=time.time(); n=5
for i in range(n):
    state, m = step(state, vq_params, batch, jax.random.key(5+i))
    l = float(m["loss"])
dt=(time.time()-t0)/n
print(f"d16 train step B={B}: {dt*1e3:.0f}ms -> {B/dt:.1f} img/s/chip (loss {l:.3f})", flush=True)

# token-path variant (offline tokenization)
ids_c = [jax.random.randint(jax.random.key(10+i), (B, pn*pn), 0, 4096) for i, pn in enumerate(cfg.patch_nums)]
ids_i = [jax.random.randint(jax.random.key(30+i), (B, pn*pn), 0, 4096) for i, pn in enumerate(cfg.patch_nums)]
tb = {"ctrl_ids": ids_c, "img_ids": ids_i, "cls": batch["cls"], "type": batch["type"]}
step_t = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k, from_tokens=True))
state, m = step_t(state, vq_params, tb, jax.random.key(50)); l=float(m["loss"])
t0=time.time()
for i in range(n):
    state, m = step_t(state, vq_params, tb, jax.random.key(51+i)); l=float(m["loss"])
dt=(time.time()-t0)/n
print(f"d16 token train step B={B}: {dt*1e3:.0f}ms -> {B/dt:.1f} img/s/chip", flush=True)
