from controlvar_tpu.ckpt.torch_import import (  # noqa: F401
    convert_vqvae_state_dict,
    convert_var_state_dict,
    convert_control_var_state_dict,
    load_torch_state_dict,
)
