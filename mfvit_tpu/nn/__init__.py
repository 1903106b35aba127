from mfvit_tpu.nn import init, layers, posembed, vit  # noqa: F401
