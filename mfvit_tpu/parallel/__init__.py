from mfvit_tpu.parallel import mesh  # noqa: F401
from mfvit_tpu.parallel.mesh import (batch_sharded,  # noqa: F401
                                     make_mesh, make_moco_parallel_step,
                                     replicate, replicated, shard_batch)
