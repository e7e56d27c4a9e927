from controlvar_tpu.losses.vqperceptual import VQLPIPSWithDiscriminator  # noqa: F401
