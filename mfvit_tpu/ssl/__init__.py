from mfvit_tpu.ssl import moco  # noqa: F401
from mfvit_tpu.ssl.moco import MoCoConfig, make_pretrain_step  # noqa: F401
