"""Piecewise budget of the MoCo v2-queue pretrain step (VERDICT r3 #9).

Attributes the ~108 ms/step (B=256, K=65536, vit_small, bf16) to its
structural pieces so the banked 2,371 img/s number is shown to be at (or
near) its bound:

  full      — the production pretrain step (fwd_q + fwd_k + bwd + EMA +
              queue einsum/enqueue + adamw), bench_train_steps timing
  fwd_q     — base encoder -> projector -> predictor -> l2norm (the
              gradient-bearing query forward)
  fwd_k     — momentum tower forward (+ predictor-on-keys)
  fwd_bwd   — value_and_grad of the InfoNCE loss through the query path
              (fixed keys/queue): forward + backward + grad materialize
  ema       — EMA update of the full momentum tower (22M params)
  einsum    — l_pos/l_neg logits vs the 256x65536 queue + log-softmax CE
  enqueue   — queue ring write (dynamic_update_slice of (256, 65536))
  adamw     — optimizer update + apply on the trainable tree

Methodology: big pieces (>= 20 ms) use the bench_train_steps lag-fetch
loop; sub-ms pieces are fori_loop-chained R=256 times inside one jit so
per-call wall sits far above the ~33 ms axon dispatch floor, then
divided by R.

Usage: ./tools_tpurun.sh tools/profile_moco.py [batch]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mfvit_tpu.nn import vit
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import optim

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = vit.get_config("vit_small")
mcfg = moco.MoCoConfig(K=65536, T=0.2)
DT = jnp.bfloat16

state = moco.init(jax.random.PRNGKey(0), mcfg, cfg)
tx = optim.build_optimizer("adamw", 1e-3, weight_decay=0.1)
opt_state0 = tx.init({"base": state["base"],
                      "predictor": state["predictor"]})
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
imq = jax.random.normal(k1, (B, 224, 224, 3), DT)
imk = jax.random.normal(k2, (B, 224, 224, 3), DT)
m = jnp.float32(0.99)
results = {}


def lag_time(name, fn, state_args, const_args, iters=10, warmup=2):
    """bench_train_steps.timeit: threaded donated state, 1-iter-lag fetch
    of the first output leaf."""
    st = list(state_args)
    for _ in range(warmup):
        out = fn(*st, *const_args)
        out = out if isinstance(out, tuple) else (out,)
        st = list(out[:len(state_args)])
        float(np.asarray(jax.tree_util.tree_leaves(
            out[min(len(state_args), len(out) - 1)])[0]).ravel()[0])
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = fn(*st, *const_args)
        out = out if isinstance(out, tuple) else (out,)
        st = list(out[:len(state_args)])
        if pending is not None:
            float(np.asarray(jax.tree_util.tree_leaves(pending)[0]
                             ).ravel()[0])
        pending = out[min(len(state_args), len(out) - 1)]
    float(np.asarray(jax.tree_util.tree_leaves(pending)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:10s} {ms:8.2f} ms", flush=True)
    results[name] = ms
    return st


# ---- full production step
step = jax.jit(moco.make_pretrain_step(mcfg, cfg, tx, compute_dtype=DT),
               donate_argnums=(0, 1))
lag_time("full", step,
         [jax.tree.map(jnp.copy, state), jax.tree.map(jnp.copy, opt_state0)],
         [imq, imk, m])


# ---- query forward (encoder -> projector -> predictor -> l2norm)
@jax.jit
def fwd_q(x):
    z, _ = moco._encode(state["base"], x, mcfg, cfg, training=True,
                        axis_name=None, compute_dtype=DT,
                        stop_grad_conv1=True)
    q, _ = moco._mlp_apply(state["predictor"], z, training=True,
                           axis_name=None)
    return moco._l2norm(q)


lag_time("fwd_q", fwd_q, [], [imq])


# ---- key forward (momentum tower + predictor-on-keys)
@jax.jit
def fwd_k(x):
    z, _ = moco._encode(state["momentum"], x, mcfg, cfg, training=True,
                        axis_name=None, compute_dtype=DT,
                        stop_grad_conv1=False)
    zk, _ = moco._mlp_apply(state["predictor"], z, training=True,
                            axis_name=None)
    return moco._l2norm(zk)


lag_time("fwd_k", fwd_k, [], [imk])

# ---- forward+backward of the InfoNCE through the query path
fixed_k = moco._l2norm(
    jax.random.normal(jax.random.PRNGKey(3), (B, mcfg.dim)))
gp0 = {"enc": state["base"]["encoder"],
       "proj": state["base"]["projector"], "pred": state["predictor"]}


def qloss(gp, x, queue):
    z, _ = moco._encode({"encoder": gp["enc"], "projector": gp["proj"]},
                        x, mcfg, cfg, training=True, axis_name=None,
                        compute_dtype=DT, stop_grad_conv1=True)
    q, _ = moco._mlp_apply(gp["pred"], z, training=True, axis_name=None)
    q = moco._l2norm(q)
    l_pos = jnp.einsum("nc,nc->n", q, fixed_k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / mcfg.T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


@jax.jit
def fwd_bwd(x, queue):
    loss, grads = jax.value_and_grad(qloss)(gp0, x, queue)
    gsum = sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree_util.tree_leaves(grads))
    return loss + 1e-30 * gsum


lag_time("fwd_bwd", fwd_bwd, [], [imq, state["queue"]])

R = 256


def chained(name, body, carry0, r=R):
    """fori_loop-chain a sub-ms piece r times inside one jit."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, r, body, c)

    out = run(carry0)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry0)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms = best / r * 1000.0
    print(f"{name:10s} {ms:8.2f} ms  (chained x{r}, "
          f"{best * 1000:.0f} ms/call)", flush=True)
    results[name] = ms


# ---- EMA of the momentum tower (depends on iteration via m_i)
chained("ema",
        lambda i, c: moco._ema_update(c, state["base"],
                                      m + 1e-9 * i.astype(jnp.float32)),
        jax.tree.map(jnp.copy, state["momentum"]), r=64)

# ---- queue einsum + CE (carry feeds q so iterations chain)
q_fixed = moco._l2norm(
    jax.random.normal(jax.random.PRNGKey(4), (B, mcfg.dim)))
queue_c = jnp.copy(state["queue"])


def einsum_body(i, c):
    q = q_fixed * (1.0 + 1e-30 * c)
    l_pos = jnp.einsum("nc,nc->n", q, fixed_k)[:, None]
    l_neg = jnp.einsum("nc,ck->nk", q, queue_c)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / mcfg.T
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


chained("einsum", einsum_body, jnp.zeros(()))

# ---- queue ring write
keys_t = fixed_k.T


def enqueue_body(i, c):
    queue, ptr = c
    queue = jax.lax.dynamic_update_slice(queue, keys_t, (0, ptr))
    return (queue, (ptr + B) % mcfg.K)


chained("enqueue", enqueue_body,
        (jnp.copy(state["queue"]), jnp.zeros((), jnp.int32)))

# ---- optimizer update on fixed grads
fixed_grads = jax.tree.map(
    lambda x: jnp.full_like(x, 1e-4),
    {"base": state["base"], "predictor": state["predictor"]})


def opt_body(i, c):
    params, os_ = c
    updates, os_ = tx.update(fixed_grads, os_, params)
    return (optax.apply_updates(params, updates), os_)


chained("adamw", opt_body,
        ({"base": jax.tree.map(jnp.copy, state["base"]),
          "predictor": jax.tree.map(jnp.copy, state["predictor"])},
         jax.tree.map(jnp.copy, opt_state0)), r=64)

bound = (results["fwd_bwd"] + results["fwd_k"] + results["ema"]
         + results["einsum"] + results["enqueue"] + results["adamw"])
print(f"\nstructural bound (fwd_bwd + fwd_k + ema + einsum + enqueue + "
      f"adamw) = {bound:.1f} ms vs full {results['full']:.1f} ms "
      f"({100 * bound / results['full']:.0f}% accounted)")
print(f"throughput: full = {B / results['full'] * 1000:.0f} img/s")
