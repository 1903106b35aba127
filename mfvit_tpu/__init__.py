"""MF-ViT TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of endiqq/Multi-Feature-ViT.

Subpackages
-----------
- ``nn``       ViT-S/16 backbone and neural-net primitives (pure-functional pytrees).
- ``ops``      Pallas TPU kernels (fused MHSA flash attention, 1-query cross-attention)
               with XLA fallbacks.
- ``data``     CheXpert-style manifest datasets, host decode + device-fused
               augmentation, paired CXR/Enh streaming.
- ``ssl``      MoCo self-supervised objectives (v3 structure; v2 queue loss and
               v3 symmetric loss).
- ``models``   MF-ViT CA cross-attention fusion and alternative fusion heads.
- ``train``    Optimizers/schedules (optax), jitted train/eval steps, meters.
- ``parallel`` Device mesh setup and sharding helpers (pjit/shard_map over ICI).
- ``exp``      Experiment harness: 5-draws loop, storage layout, checkpoints
               (orbax), metrics, logging.
- ``cli``      Entry points mirroring the reference's three main scripts.
"""

__version__ = "0.1.0"

from mfvit_tpu import data, exp, models, ops, parallel, ssl, train  # noqa: F401,E402
from mfvit_tpu.nn import init, layers, posembed, resnet, vit  # noqa: F401,E402
