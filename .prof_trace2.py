import jax, jax.numpy as jnp, glob, os, gzip, json, collections
from controlvar_tpu.config import control_var_config_from_depth
from controlvar_tpu.models import transformer as tfm
from controlvar_tpu.models.control_var import ControlVARModel

cfg = control_var_config_from_depth(16, multi_cond=True)
model = ControlVARModel(cfg)
params = model.init_params(jax.random.key(1))
B2 = 32
cond = jax.random.normal(jax.random.key(0), (B2, cfg.embed_dim))
ck, cv = tfm.init_kv_cache(cfg, B2, cfg.seq_len, jnp.bfloat16)
x = jax.random.normal(jax.random.key(2), (B2, 512, cfg.embed_dim), jnp.bfloat16)
step = jax.jit(lambda bp, x, cond, ck, cv: tfm.blocks_decode(bp, x, cond, cfg, ck, cv, 848))
out = step(params["blocks"], x, cond, ck, cv)
print("warm checksum:", float(jnp.sum(out[0].astype(jnp.float32))))
os.system("rm -rf /tmp/jaxtrace2")
with jax.profiler.trace("/tmp/jaxtrace2"):
    out = step(params["blocks"], x, cond, ck, cv)
    s = float(jnp.sum(out[0].astype(jnp.float32)))
path = glob.glob('/tmp/jaxtrace2/plugins/profile/*/*.trace.json.gz')[0]
with gzip.open(path) as f: trace = json.load(f)
by = collections.Counter()
for e in trace["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e:
        by[e.get("name","")] += e["dur"]
for name, dur in by.most_common(24):
    print(f"{dur/1e3:8.2f}ms  {name[:110]}")
