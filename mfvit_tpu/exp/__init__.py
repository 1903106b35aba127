from mfvit_tpu.exp import checkpoint, harness, storage  # noqa: F401
