import time, jax, jax.numpy as jnp
def timed(name, f, *a, n=10):
    s = float(f(*a))
    t0=time.perf_counter()
    for _ in range(n): s = float(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f}ms", flush=True)

B=16
for l in (512,):
    logits = jax.random.normal(jax.random.key(0), (B, l, 4096))
    f1 = jax.jit(lambda x: jnp.sum(jax.lax.top_k(x, 900)[0]))
    f2 = jax.jit(lambda x: jnp.sum(jax.lax.approx_max_k(x, 900)[0]))
    f3 = jax.jit(lambda x: jnp.sum(jnp.sort(x, axis=-1)))
    timed(f"exact top_k l={l}", f1, logits)
    timed(f"approx_max_k l={l}", f2, logits)
    timed(f"full sort l={l}", f3, logits)
    # bisection threshold approach for top-k
    def kth_threshold(x, k=900, iters=24):
        lo = jnp.min(x, axis=-1, keepdims=True); hi = jnp.max(x, axis=-1, keepdims=True)
        def body(i, lohi):
            lo, hi = lohi
            mid = 0.5*(lo+hi)
            cnt = jnp.sum(x >= mid, axis=-1, keepdims=True)
            return (jnp.where(cnt > k, mid, lo), jnp.where(cnt > k, hi, mid))
        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return lo
    f4 = jax.jit(lambda x: jnp.sum(kth_threshold(x)))
    timed(f"bisect-threshold l={l}", f4, logits)
