import time, jax, jax.numpy as jnp
from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
cfg = control_var_config_from_depth(16, multi_cond=True)
vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
model = ControlVARModel(cfg)
params = model.init_params(jax.random.key(1))
B = 16
lab = jnp.arange(B, dtype=jnp.int32); ct = jnp.zeros((B,), jnp.int32)
def run(key):
    c, i = model.sample_joint_cfg(params, vqvae, vq_params, lab, ct, key,
                                  cfg_scale=4.0, top_k=900, top_p=0.96)
    return jnp.sum(i).astype(jnp.float32)
f = jax.jit(run)
t0=time.time(); s = float(f(jax.random.key(2)))
print(f"fused compile+first: {time.time()-t0:.1f}s (checksum {s:.1f})", flush=True)
t0=time.time(); n=5
for i in range(n): s = float(f(jax.random.key(3+i)))
dt=(time.time()-t0)/n
print(f"fused B={B}: {dt*1e3:.0f}ms -> {B/dt:.1f} img/s/chip", flush=True)
