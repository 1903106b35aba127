"""Entry points mirroring the reference's three main scripts (SURVEY §2.1):

- ``python -m mfvit_tpu.cli.pretrain``  <- MoCo-COVID pretrain main
- ``python -m mfvit_tpu.cli.finetune``  <- LP/FT main (``--semi-supervised`` = FT)
- ``python -m mfvit_tpu.cli.fuse``      <- MF-ViT CA fusion main
"""
