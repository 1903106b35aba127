from mfvit_tpu.models import fusion  # noqa: F401
