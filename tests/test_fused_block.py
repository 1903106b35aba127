"""Parity tests for the whole-block kernel (ops/fused_block.py) against the
two-kernel chain it merges (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mfvit_tpu.ops.fused_attn import fused_attention_block
from mfvit_tpu.ops.fused_block import fused_transformer_block
from mfvit_tpu.ops.fused_mlp import fused_mlp_block

B, N, D, H = 4, 197, 64, 4


@pytest.fixture(scope="module")
def block_params():
    k = jax.random.split(jax.random.PRNGKey(0), 12)
    return dict(
        x=jax.random.normal(k[0], (B, N, D), jnp.float32),
        ln1s=1 + 0.1 * jax.random.normal(k[1], (D,)),
        ln1b=0.1 * jax.random.normal(k[2], (D,)),
        wqkv=0.1 * jax.random.normal(k[3], (D, 3 * D)),
        bqkv=0.1 * jax.random.normal(k[4], (3 * D,)),
        wproj=0.1 * jax.random.normal(k[5], (D, D)),
        bproj=0.1 * jax.random.normal(k[6], (D,)),
        ln2s=1 + 0.1 * jax.random.normal(k[7], (D,)),
        ln2b=0.1 * jax.random.normal(k[8], (D,)),
        w1=0.1 * jax.random.normal(k[9], (D, 4 * D)),
        b1=0.1 * jax.random.normal(k[10], (4 * D,)),
        w2=0.1 * jax.random.normal(k[11], (4 * D, D)),
        b2=jnp.zeros((D,)),
    )


def _two_kernel(p):
    h = fused_attention_block(p["x"], p["ln1s"], p["ln1b"], p["wqkv"],
                              p["bqkv"], p["wproj"], p["bproj"], H,
                              (D // H) ** -0.5, True)
    return fused_mlp_block(h, p["ln2s"], p["ln2b"], p["w1"], p["b1"],
                           p["w2"], p["b2"], True)


def _one_kernel(p):
    return fused_transformer_block(
        p["x"], p["ln1s"], p["ln1b"], p["wqkv"], p["bqkv"], p["wproj"],
        p["bproj"], p["ln2s"], p["ln2b"], p["w1"], p["b1"], p["w2"],
        p["b2"], H, (D // H) ** -0.5, True)


def test_forward_matches_two_kernel_chain(block_params):
    np.testing.assert_allclose(np.asarray(_one_kernel(block_params)),
                               np.asarray(_two_kernel(block_params)),
                               rtol=2e-5, atol=2e-5)


def test_backward_matches_two_kernel_chain(block_params):
    g1 = jax.grad(lambda p: jnp.sum(_one_kernel(p) ** 2))(block_params)
    g2 = jax.grad(lambda p: jnp.sum(_two_kernel(p) ** 2))(block_params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
