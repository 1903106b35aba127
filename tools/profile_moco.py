"""Piecewise budget of the MoCo v2-queue pretrain step (VERDICT r3 #9).

Attributes the ~108 ms/step (B=256, K=65536, vit_small, bf16) to its
structural pieces so the banked 2,371 img/s number is shown to be at (or
near) its bound:

  full      — the production pretrain step (fwd_q + fwd_k + bwd + EMA +
              queue einsum/enqueue + adamw)
  fwd_q     — base encoder -> projector -> predictor -> l2norm (the
              gradient-bearing query forward)
  fwd_k     — momentum tower forward (+ predictor-on-keys)
  fwd_bwd   — value_and_grad of the InfoNCE loss through the query path
              (fixed keys/queue): forward + backward + grad materialize
  ema       — EMA update of the full momentum tower (22M params)
  einsum    — l_pos/l_neg logits vs the 256x65536 queue + log-softmax CE
  enqueue   — queue ring write (dynamic_update_slice of (256, 65536))
  adamw     — optimizer update + apply on the trainable tree

Methodology: every piece is lax.scan-chained R times inside ONE jit and
timed at two R values; piece cost = (t(2R) - t(R)) / R, which cancels the
~33 ms axon dispatch floor exactly (CLAUDE.md benchmarking rule).

Usage: ./tools_tpurun.sh tools/profile_moco.py [batch]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.nn import vit
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import optim

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R = 8
cfg = vit.get_config("vit_small")
mcfg = moco.MoCoConfig(K=65536, T=0.2)
DT = jnp.bfloat16

state = moco.init(jax.random.PRNGKey(0), mcfg, cfg)
tx = optim.build_optimizer("adamw", 1e-3, weight_decay=0.1)
opt_state = tx.init({"base": state["base"], "predictor": state["predictor"]})
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
imq = jax.random.normal(k1, (B, 224, 224, 3), DT)
imk = jax.random.normal(k2, (B, 224, 224, 3), DT)
m = jnp.float32(0.99)


def scan_time(name, body, carry0, iters=R):
    """One jitted lax.scan of `body` over `iters` steps; returns wall ms."""
    fn = jax.jit(lambda c: jax.lax.scan(lambda cc, _: (body(cc), None),
                                        c, None, length=iters)[0],
                 static_argnums=())
    out = fn(carry0)
    jax.block_until_ready(out)  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(carry0)
        jax.block_until_ready(out)
        # force a fetch through the tunnel (block_until_ready is not
        # enough through axon — docs/PERF.md)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def piece(name, body, carry0):
    t1 = scan_time(name, body, carry0, iters=R)
    t2 = scan_time(name, body, carry0, iters=2 * R)
    ms = (t2 - t1) / R
    print(f"{name:10s} {ms:8.2f} ms/iter", flush=True)
    return ms


results = {}

# ---- full production step
step = moco.make_pretrain_step(mcfg, cfg, tx, compute_dtype=DT)


def full_body(c):
    st, os_ = c
    st, os_, loss = step(st, os_, imq, imk, m)
    return (st, os_)


results["full"] = piece("full", full_body,
                        (jax.tree.map(jnp.copy, state),
                         jax.tree.map(jnp.copy, opt_state)))

# ---- query forward (encoder -> projector -> predictor -> l2norm)
def fwd_q_body(c):
    z, _ = moco._encode(state["base"], imq * (1 + 0 * c[0, 0]), mcfg, cfg,
                        training=True, axis_name=None, compute_dtype=DT,
                        stop_grad_conv1=True)
    q, _ = moco._mlp_apply(state["predictor"], z, training=True,
                           axis_name=None)
    return moco._l2norm(q)


results["fwd_q"] = piece("fwd_q", fwd_q_body, jnp.zeros((B, mcfg.dim)))

# ---- key forward (momentum tower + predictor-on-keys)
def fwd_k_body(c):
    z, _ = moco._encode(state["momentum"], imk * (1 + 0 * c[0, 0]), mcfg,
                        cfg, training=True, axis_name=None,
                        compute_dtype=DT, stop_grad_conv1=False)
    zk, _ = moco._mlp_apply(state["predictor"], z, training=True,
                            axis_name=None)
    return moco._l2norm(zk)


results["fwd_k"] = piece("fwd_k", fwd_k_body, jnp.zeros((B, mcfg.dim)))

# ---- forward+backward of the InfoNCE through the query path
fixed_k = jax.random.normal(jax.random.PRNGKey(3), (B, mcfg.dim))
fixed_k = moco._l2norm(fixed_k)


def qloss(gp, x):
    z, _ = moco._encode({"encoder": gp["enc"], "projector": gp["proj"]},
                        x, mcfg, cfg, training=True, axis_name=None,
                        compute_dtype=DT, stop_grad_conv1=True)
    q, _ = moco._mlp_apply(gp["pred"], z, training=True, axis_name=None)
    q = moco._l2norm(q)
    l_pos = jnp.einsum("nc,nc->n", q, fixed_k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, state["queue"])
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / mcfg.T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


gp0 = {"enc": state["base"]["encoder"], "proj": state["base"]["projector"],
       "pred": state["predictor"]}


def fwd_bwd_body(c):
    loss, grads = jax.value_and_grad(qloss)(gp0, imq * (1 + 0 * c))
    # consume every grad leaf so none is dead-code-eliminated
    gsum = sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree_util.tree_leaves(grads))
    return loss + 1e-30 * gsum


results["fwd_bwd"] = piece("fwd_bwd", fwd_bwd_body, jnp.zeros(()))

# ---- EMA of the momentum tower
def ema_body(c):
    return moco._ema_update(c, state["base"], m)


results["ema"] = piece("ema", ema_body,
                       jax.tree.map(jnp.copy, state["momentum"]))

# ---- queue einsum + CE
q_fixed = moco._l2norm(
    jax.random.normal(jax.random.PRNGKey(4), (B, mcfg.dim)))


def einsum_body(c):
    q = q_fixed * (1 + 1e-30 * c)
    l_pos = jnp.einsum("nc,nc->n", q, fixed_k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, state["queue"])
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / mcfg.T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


results["einsum"] = piece("einsum", einsum_body, jnp.zeros(()))

# ---- queue ring write
keys_t = fixed_k.T.astype(state["queue"].dtype)


def enqueue_body(c):
    queue, ptr = c
    queue = jax.lax.dynamic_update_slice(queue, keys_t, (0, ptr))
    return (queue, (ptr + B) % mcfg.K)


results["enqueue"] = piece("enqueue", enqueue_body,
                           (jnp.copy(state["queue"]),
                            jnp.zeros((), jnp.int32)))

# ---- optimizer update on fixed grads
import optax

fixed_grads = jax.tree.map(
    lambda x: jnp.full_like(x, 1e-4),
    {"base": state["base"], "predictor": state["predictor"]})


def opt_body(c):
    params, os_ = c
    updates, os_ = tx.update(fixed_grads, os_, params)
    return (optax.apply_updates(params, updates), os_)


results["adamw"] = piece("adamw", opt_body,
                         ({"base": jax.tree.map(jnp.copy, state["base"]),
                           "predictor": jax.tree.map(jnp.copy,
                                                     state["predictor"])},
                          jax.tree.map(jnp.copy, opt_state)))

bound = (results["fwd_bwd"] + results["fwd_k"] + results["ema"]
         + results["einsum"] + results["enqueue"] + results["adamw"])
print(f"\nstructural bound (fwd_bwd + fwd_k + ema + einsum + enqueue + "
      f"adamw) = {bound:.1f} ms vs full {results['full']:.1f} ms "
      f"({100 * bound / results['full']:.0f}% accounted)")
print(f"throughput: full = {B / results['full'] * 1000:.0f} img/s")
