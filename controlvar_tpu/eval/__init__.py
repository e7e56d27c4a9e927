from controlvar_tpu.eval.harness import (  # noqa: F401
    SamplingHarness,
    class_shard,
)
