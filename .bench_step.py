import time, jax, jax.numpy as jnp
from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.eval.stepwise import StepwiseJointSampler

cfg = control_var_config_from_depth(16, multi_cond=True)
vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
model = ControlVARModel(cfg)
params0 = model.init_params(jax.random.key(1))
sampler = StepwiseJointSampler(model, vqvae)
params = sampler.prepare_params(params0)
for B in (16,):
    try:
        lab = jnp.arange(B, dtype=jnp.int32); ct = jnp.zeros((B,), jnp.int32)
        t0=time.time()
        img_c, img_i = sampler(params, vq_params, lab, ct, jax.random.key(2))
        s = float(jnp.sum(img_i))
        print(f"B={B} compile+first: {time.time()-t0:.1f}s (checksum {s:.1f})", flush=True)
        t0=time.time(); n=3
        for i in range(n):
            img_c, img_i = sampler(params, vq_params, lab, ct, jax.random.key(3+i))
            s = float(jnp.sum(img_i))
        dt=(time.time()-t0)/n
        print(f"B={B}: {dt*1e3:.0f}ms -> {B/dt:.1f} img/s/chip", flush=True)
    except Exception as e:
        print(f"B={B}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)
