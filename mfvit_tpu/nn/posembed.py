"""Fixed 2-D sin-cos position embeddings (MoCo-v3 ViT style).

The reference's external ``vits`` module (MoCo-v3 ``vits.py``, imported at
/root/reference/main_covid_...vitsmall.py:39 but not vendored) replaces the
learned position embedding with a fixed 2-D sine-cosine table built from a
meshgrid over the 14x14 patch grid, with an all-zeros row prepended for the
CLS token. We reproduce that construction so checkpoints and logits can be
compared numerically.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sincos_2d(grid_h: int, grid_w: int, dim: int, temperature: float = 10000.0,
              with_cls: bool = True) -> jnp.ndarray:
    """Build the (1, [1+]H*W, dim) fixed position-embedding table.

    Matches MoCo-v3's ``build_2d_sincos_position_embedding``: per-axis
    frequency bands of dim/4 channels, concatenated as
    [sin(h), cos(h), sin(w), cos(w)], CLS row = zeros.
    """
    assert dim % 4 == 0, "sincos_2d requires embed dim divisible by 4"
    # torch.meshgrid(grid_w, grid_h) with 'ij' indexing, then .flatten() —
    # matches MoCo-v3's build_2d_sincos_position_embedding verbatim.
    gw, gh = np.meshgrid(
        np.arange(grid_w, dtype=np.float32),
        np.arange(grid_h, dtype=np.float32),
        indexing="ij",
    )
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = np.einsum("m,d->md", gw.flatten(), omega)
    out_h = np.einsum("m,d->md", gh.flatten(), omega)
    pe = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )  # (H*W, dim)
    if with_cls:
        pe = np.concatenate([np.zeros((1, dim), np.float32), pe], axis=0)
    return jnp.asarray(pe[None], dtype=jnp.float32)
