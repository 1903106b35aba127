from mfvit_tpu.data import constants, datasets, device_aug, host_transforms  # noqa: F401
from mfvit_tpu.data import manifest, pipeline  # noqa: F401
from mfvit_tpu.data.constants import norm_stats  # noqa: F401
from mfvit_tpu.data.pipeline import BatchLoader, device_prefetch  # noqa: F401
