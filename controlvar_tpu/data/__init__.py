from controlvar_tpu.data.build import create_dataset, Loader  # noqa: F401
