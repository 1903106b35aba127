"""Device-side training-step throughput (synthetic device-resident data).

Produces the docs/PERF.md training table: jitted train steps only — no
host decode — timed with the 1-iteration-lag fetch of the loss scalar
(bench.py methodology).

  ft        — ViT-S classifier train step (fwd+bwd+SGD), B=256
  fusion    — MF-ViT CA fusion train step, B=256 pairs
  moco      — MoCo v2-queue pretrain step (K=65536), B=256
  vit_base  — vit_base classifier train step, B=64

Run: ./tools_tpurun.sh tools/bench_train_steps.py [which ...]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mfvit_tpu.models import fusion
from mfvit_tpu.nn import vit
from mfvit_tpu.ssl import moco
from mfvit_tpu.train import optim, steps


def timeit(name, step, state_args, batch_args, iters=12, warmup=2):
    """state_args are threaded through (donated pytrees); batch_args are
    static device arrays. The loss scalar is fetched with a 1-iter lag."""
    st = state_args
    for _ in range(warmup):
        out = step(*st, *batch_args)
        st = out[:len(state_args)]
        float(np.asarray(out[len(state_args)]))
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        out = step(*st, *batch_args)
        st = out[:len(state_args)]
        if pending is not None:
            float(np.asarray(pending))
        pending = out[len(state_args)]
    float(np.asarray(pending))
    dt = (time.perf_counter() - t0) / iters
    b = batch_args[0].shape[0]
    print(f"{name:10s} {dt * 1000:7.1f} ms/step  {b / dt:7.0f} img|pairs/s",
          flush=True)


def bench_ft(arch="vit_small", B=256):
    cfg = vit.get_config(arch)
    tx = optim.build_optimizer("sgd", 0.01, momentum=0.9)
    train_step, _ = steps.make_classifier_steps(cfg, tx)
    params = vit.init(jax.random.PRNGKey(0), cfg, num_classes=3)
    state = tx.init(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                            jnp.bfloat16)
    lab = jnp.zeros((B,), jnp.int32)
    timeit(arch, train_step, (params, state), (img, lab))


def bench_fusion(B=256, freeze=False):
    cfg = vit.get_config("vit_small")
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    fparams = {"cxr": vit.init(k1, cfg, num_classes=3),
               "enh": vit.init(k2, cfg, num_classes=3),
               "fus": fusion.init(k3, num_classes=3)}
    mask = None
    if freeze:
        # the production LP protocol: ViT bodies frozen (fusion main
        # :297-313), backward stops at the feature boundary
        mask = {"cxr": optim.head_only_mask(fparams["cxr"]),
                "enh": optim.head_only_mask(fparams["enh"]),
                "fus": jax.tree.map(lambda _: True, fparams["fus"])}
    tx = optim.build_optimizer("adam", 1e-4, trainable_mask=mask)
    ftrain, _ = steps.make_fusion_steps(cfg, tx, freeze_backbones=freeze)
    state = tx.init(fparams)
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                            jnp.bfloat16)
    lab = jnp.zeros((B,), jnp.int32)
    timeit("fusion_lp" if freeze else "fusion", ftrain, (fparams, state),
           (img, img, lab))


def bench_moco(B=256):
    cfg = moco.MoCoConfig()  # v2-queue default, K=65536
    vit_cfg = vit.get_config("vit_small")
    state = moco.init(jax.random.PRNGKey(0), cfg, vit_cfg)
    tx = optim.build_optimizer("adamw", 1.5e-4, weight_decay=0.1)
    opt_state = tx.init({"base": state["base"],
                         "predictor": state["predictor"]})
    step = jax.jit(moco.make_pretrain_step(cfg, vit_cfg, tx),
                   donate_argnums=(0, 1))
    q = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(2), (B, 224, 224, 3),
                          jnp.bfloat16)
    m = jnp.float32(0.99)
    timeit("moco", lambda s, o, a, b: step(s, o, a, b, m),
           (state, opt_state), (q, k))


if __name__ == "__main__":
    which = sys.argv[1:] or ["ft", "fusion", "fusion_lp", "moco",
                             "vit_base"]
    if "ft" in which:
        bench_ft()
    if "fusion" in which:
        bench_fusion()
    if "fusion_lp" in which:
        bench_fusion(freeze=True)
    if "moco" in which:
        bench_moco()
    if "vit_base" in which:
        bench_ft("vit_base", B=64)
