from mfvit_tpu.models import crossvit_cnn, fusion, gpt_fusion  # noqa: F401
