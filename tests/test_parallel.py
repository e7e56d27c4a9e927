"""Multi-device tests on the virtual CPU mesh: TP-sharded sampling (the
multi-chip serving path) and sharding-rule contracts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from controlvar_tpu.config import ControlVARConfig, VQVAEConfig
from controlvar_tpu.models.control_var import ControlVARModel
from controlvar_tpu.models.vqvae import VQVAE
from controlvar_tpu.parallel.mesh import make_mesh, param_shardings, param_pspec

VQ_CFG = VQVAEConfig(ch=32, patch_nums=(1, 2, 4), vocab_size=64)
CFG = ControlVARConfig(
    depth=2, embed_dim=128, num_heads=2, patch_nums=(1, 2, 4),
    vocab_size=64, cvae=32, num_classes=8, mask_factor=2, multi_cond=True,
)


def test_param_pspec_rules():
    assert param_pspec(("blocks", "qkv_kernel"), None) == P(None, None, "model")
    assert param_pspec(("blocks", "proj", "kernel"), None) == P(None, "model", None)
    assert param_pspec(("blocks", "fc1", "kernel"), None) == P(None, None, "model")
    assert param_pspec(("blocks", "fc2", "kernel"), None) == P(None, "model", None)
    assert param_pspec(("head", "kernel"), None) == P(None, "model")
    assert param_pspec(("pos_1LC",), None) == P()
    assert param_pspec(("class_emb",), None) == P()


def test_tp_sharded_sampling(cpu_mesh_devices):
    """Joint CFG sampling with tensor-parallel params on a 2x4 mesh must give
    the same samples as the unsharded run (pure SPMD: math is identical)."""
    mesh = make_mesh(data=2, model=4, devices=cpu_mesh_devices)
    vqvae = VQVAE(VQ_CFG)
    vq_params = vqvae.init_params(jax.random.key(0))
    model = ControlVARModel(CFG)
    params = model.init_params(jax.random.key(1))
    labels = jnp.asarray([0, 1], jnp.int32)
    ct = jnp.asarray([0, 1], jnp.int32)

    sample = jax.jit(
        lambda p, vp, l, c, k: model.sample_joint_cfg(
            p, vqvae, vp, l, c, k, cfg_scale=2.0, top_k=8, top_p=0.9,
            compute_dtype=jnp.float32,
        )
    )
    ref_c, ref_i = sample(params, vq_params, labels, ct, jax.random.key(2))

    p_sh = param_shardings(mesh, params)
    params_sh = jax.device_put(params, p_sh)
    vq_sh = jax.device_put(
        vq_params, jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), vq_params)
    )
    with mesh:
        tp_c, tp_i = sample(params_sh, vq_sh, labels, ct, jax.random.key(2))
    # fp32 SPMD on CPU: collectives may reorder reductions; tokens could in
    # principle flip on exact ties, so allow tiny numeric differences
    np.testing.assert_allclose(np.asarray(tp_c), np.asarray(ref_c), atol=2e-3)
    np.testing.assert_allclose(np.asarray(tp_i), np.asarray(ref_i), atol=2e-3)
    # qkv kernel is genuinely sharded over 'model'
    assert params_sh["blocks"]["qkv_kernel"].sharding.spec == P(None, None, "model")
