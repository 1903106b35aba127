from mfvit_tpu.ops.attention import (  # noqa: F401
    cross_attention_1q,
    mhsa,
    mhsa_reference,
    set_default_backend,
)
