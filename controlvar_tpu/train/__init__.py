from controlvar_tpu.train.lr_schedule import lr_wd_at_step  # noqa: F401
from controlvar_tpu.train.param_groups import weight_decay_mask  # noqa: F401
