"""Worker for the 2-process localhost multi-host test (test_multiprocess.py).

Runs ONE ControlVAR train step through the PRODUCTION multi-host path:
`parallel.distributed.initialize` -> global mesh over both processes'
devices -> `form_global_batch`'s make_array_from_process_local_data branch
-> jitted step with psum'd grads -> Orbax save (the multi-host barrier).
Replaces trust with execution for the branches single-process tests cannot
reach (reference counterpart: dist.py:19-49 actually running under
mp.spawn).

argv: rank nprocs port outdir
"""
import json
import os
import sys


def main() -> None:
    rank, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    import jax

    # env vars cannot force CPU in this image (sitecustomize pre-registers
    # the TPU backend); go through jax.config before any backend touch
    jax.config.update("jax_platforms", "cpu")

    from controlvar_tpu.parallel import distributed as dist

    if nprocs > 1:
        dist.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=rank,
        )
    assert jax.process_count() == nprocs
    assert dist.process_index() == rank

    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from controlvar_tpu.ckpt.orbax_io import CheckpointIO
    from controlvar_tpu.config import ControlVARConfig, OptimConfig, VQVAEConfig
    from controlvar_tpu.models.control_var import ControlVARModel
    from controlvar_tpu.models.vqvae import VQVAE
    from controlvar_tpu.parallel.mesh import make_mesh, param_shardings
    from controlvar_tpu.train.train_step import (
        ControlVARTrainStep,
        init_train_state,
    )

    vq_cfg = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=128)
    cfg = ControlVARConfig(
        depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
        vocab_size=128, cvae=32, num_classes=8, mask_factor=2,
        multi_cond=True,
    )
    n_dev = len(jax.devices())  # global device count (both processes)
    mesh = make_mesh(data=n_dev, devices=np.asarray(jax.devices()))

    vqvae = VQVAE(vq_cfg)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(cfg)
    params = model.init_params(jax.random.key(1))
    optim = OptimConfig(total_batch_size=8)
    state, tx = init_train_state(params, optim)
    stepper = ControlVARTrainStep(model, vqvae, optim, max_steps=100,
                                  warmup_steps=2)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    p_sh = param_shardings(mesh, state.params)
    state = state._replace(params=jax.device_put(state.params, p_sh))
    vq_params = jax.device_put(
        vq_params, jax.tree_util.tree_map(lambda _: repl, vq_params))

    # deterministic GLOBAL batch; each process feeds only its local rows —
    # exactly what the pod loader does (cli/main.py shards by process_index)
    B = 8
    hw = vq_cfg.patch_nums[-1] * 16
    g = np.random.default_rng(7)
    gbatch = {
        "image": (g.random((B, hw, hw, 3)).astype(np.float32) * 2 - 1),
        "mask": (g.random((B, hw, hw, 3)).astype(np.float32) * 2 - 1),
        "cls": g.integers(0, cfg.num_classes, (B,)).astype(np.int32),
        "type": g.integers(0, 4, (B,)).astype(np.int32),
    }
    per = B // nprocs
    local = {k: v[rank * per : (rank + 1) * per] for k, v in gbatch.items()}
    batch = dist.form_global_batch(batch_sh, local)
    assert batch["image"].shape[0] == B  # global shape, local rows supplied

    step = jax.jit(lambda s, vp, b, k: stepper.step(tx, s, vp, b, k))
    with mesh:
        state2, m = step(state, vq_params, batch, jax.random.key(5))
        jax.block_until_ready(state2.params)
    loss = float(m["loss"])

    # the multi-host Orbax save barrier (docs/MULTIHOST.md): every process
    # participates; the manager writes one sharded checkpoint
    ckpt_dir = os.path.join(outdir, "ckpt")
    io = CheckpointIO(ckpt_dir)
    io.save(1, state2, metadata={"loss": loss})
    io.manager.wait_until_finished()

    # a param fingerprint for cross-arm comparison (gathered to host)
    qkv = np.asarray(
        jax.device_get(state2.params["blocks"]["qkv_kernel"]), np.float64)
    out = {
        "rank": rank,
        "nprocs": nprocs,
        "loss": loss,
        "qkv_sum": float(qkv.sum()),
        "qkv_head": [float(x) for x in qkv.ravel()[:4]],
        "process_count": jax.process_count(),
    }
    with open(os.path.join(outdir, f"result_{nprocs}p_{rank}.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
