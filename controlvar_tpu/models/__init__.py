from controlvar_tpu.models.quantizer import MultiScaleQuantizer  # noqa: F401
