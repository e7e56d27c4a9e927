import jax, jax.numpy as jnp, glob, os
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
f = jax.jit(lambda p,vp,l,c,k: model.sample_joint_cfg(p,vqvae,vp,l,c,k,cfg_scale=4.0,top_k=900,top_p=0.96))
out = f(params, vq_params, lab, ct, jax.random.key(2)); jax.block_until_ready(out)
os.system("rm -rf /tmp/jaxtrace")
with jax.profiler.trace("/tmp/jaxtrace"):
    out = f(params, vq_params, lab, ct, jax.random.key(3))
    jax.block_until_ready(out)
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:10])
