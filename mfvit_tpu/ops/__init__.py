from mfvit_tpu.ops import quant  # noqa: F401
from mfvit_tpu.ops.attention import (  # noqa: F401
    cross_attention_1q,
    mhsa,
    mhsa_from_packed,
    mhsa_packed,
    mhsa_packed_t,
    mhsa_reference,
    set_default_backend,
)
