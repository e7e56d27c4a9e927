import time, jax, jax.numpy as jnp
from controlvar_tpu.config import VQVAEConfig, control_var_config_from_depth
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.eval.stepwise import StepwiseJointSampler

vqvae = VQVAE(VQVAEConfig())
vq_params = vqvae.init_params(jax.random.key(0))
B = 16
for depth in (12, 16, 20, 24, 30):
    try:
        cfg = control_var_config_from_depth(depth, multi_cond=True)
        model = ControlVARModel(cfg)
        params = model.init_params(jax.random.key(1))
        sampler = StepwiseJointSampler(model, vqvae)
        params = sampler.prepare_params(params)
        n_par = sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6
        lab = jnp.arange(B, dtype=jnp.int32); ct = jnp.zeros((B,), jnp.int32)
        t0=time.time()
        _c, i = sampler(params, vq_params, lab, ct, jax.random.key(2)); s=float(jnp.sum(i))
        tc=time.time()-t0
        t0=time.time(); n=3
        for k in range(n):
            _c, i = sampler(params, vq_params, lab, ct, jax.random.key(3+k)); s=float(jnp.sum(i))
        dt=(time.time()-t0)/n
        print(f"d{depth} ({n_par:.0f}M params): {dt*1e3:.0f}ms -> {B/dt:.1f} img/s/chip (compile {tc:.0f}s)", flush=True)
        del params, model, sampler
    except Exception as e:
        print(f"d{depth}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)
