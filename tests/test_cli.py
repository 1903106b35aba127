"""End-to-end CLI smoke tests on a synthetic COVID dataset: pretrain ->
finetune (LP + FT) -> fuse, each producing checkpoints and metrics."""
import json
import os

import numpy as np
import pytest

import cv2

from mfvit_tpu.data import manifest as mf

# whole-module: CLI end-to-end runs (pretrain/finetune/fuse mains on a
# synthetic dataset) are the suite's integration tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def covid_root(tmp_path_factory):
    """Synthetic dataset: 24 paired images across 3 classes + manifests."""
    root = tmp_path_factory.mktemp("covid")
    data_root = root / "images"
    man_root = root / "create_covid_dataset"
    os.makedirs(man_root)
    rng = np.random.default_rng(0)
    names, labels = [], []
    for folder in ("data", "Train_Mix"):
        os.makedirs(data_root / folder)
    for i in range(24):
        fn = f"img_{i}.png"
        label = i % 3
        for folder in ("data", "Train_Mix"):
            img = rng.integers(0, 255, (64, 72, 3), np.uint8)
            # class-correlated signal so training can learn something
            img[:, :, 0] = np.clip(img[:, :, 0] * 0.2 + label * 80, 0, 255)
            cv2.imwrite(str(data_root / folder / fn), img)
        names.append(fn)
        labels.append(label)

    mf.write_covid_manifest(str(man_root / "1_labeled_train_0.txt"),
                            str(data_root), names[:16], labels[:16])
    mf.write_covid_manifest(str(man_root / "0.5_labeled_train_0.txt"),
                            str(data_root), names[:8], labels[:8])
    mf.write_covid_manifest(str(man_root / "0.5_unlabeled_train_0.txt"),
                            str(data_root), names[:16], labels[:16])
    mf.write_covid_manifest(str(man_root / "val_ds.txt"),
                            str(data_root), names[16:20], labels[16:20])
    mf.write_covid_manifest(str(man_root / "test_ds.txt"),
                            str(data_root), names[20:], labels[20:])
    return root


COMMON = ["-a", "vit_test", "--img-size", "32", "--crop", "32",
          "--maintain-ratio", "--compute-dtype", "float32",
          "--attn-backend", "xla", "-j", "2", "--seed", "0"]


def test_pretrain_cli(covid_root):
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre"
    results = pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoke",
        "-b", "8", "--epochs", "2", "--warmup-epochs", "1", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw", "--wd", "0.1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--moco-t", "0.2", "--moco-m-cos", "--stop-grad-conv1",
        "--export-torch", "--semi-ratios", "1"])
    assert len(results) == 1
    assert np.isfinite(results[0].extra["final_loss"])
    exp = next(out.iterdir())
    sub = exp / "train_1_0"
    assert (sub / "checkpoint_best_loss").exists()
    assert (exp / "commandline_args.txt").exists()
    # --export-torch: reference-layout ckpt consumable by the reference
    # finetune surgery
    import torch as _torch
    ck = _torch.load(sub / "checkpoint_torch.pth.tar",
                     map_location="cpu", weights_only=False)
    assert "module.base_encoder.cls_token" in ck["state_dict"]


def test_pretrain_cli_v3_loss_unlabeled_split(covid_root):
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre3"
    results = pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoke3",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "lars",
        "--moco-dim", "16", "--moco-mlp-dim", "32",
        "--loss", "v3_symmetric", "--semi-ratios", "0.5", "--draws", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_pretrain_cli_resnet18(covid_root):
    """ResNet MoCo arm (the reference pretrain main accepts torchvision
    resnet archs — pretrain main :52-62)."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_r18"
    results = pretrain.main([
        "-a", "resnet18", "--img-size", "32", "--crop", "32",
        "--maintain-ratio", "--compute-dtype", "float32",
        "-j", "2", "--seed", "0",
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoker18",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "sgd",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_pretrained_resnet_arms(covid_root, tmp_path):
    """--pretrained-arms: both MoCo towers initialize from a local
    torchvision-layout resnet18 checkpoint (the reference's URL-fetched
    `pretrained` load, pretrain main :52-62, builder.py:37-44), and the
    pretrain CLI accepts the flag end-to-end."""
    import torch

    import jax
    import jax.numpy as jnp

    from mfvit_tpu.cli import pretrain
    from mfvit_tpu.exp import checkpoint as ckpt_mod
    from mfvit_tpu.nn import resnet as resnet_mod
    from mfvit_tpu.ssl import moco

    # synthetic torchvision-layout state dict (same key naming)
    sys_path = str(tmp_path / "resnet18.pth")
    import importlib
    tp = importlib.import_module("test_torch_parity")
    tm = tp._TorchResNet18()
    with torch.no_grad():  # non-trivial BN running stats
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(1.3)
    torch.save(tm.state_dict(), sys_path)

    # unit: graft == converter output on both towers, projector untouched
    cfg = resnet_mod.get_config("resnet18")
    mcfg = moco.MoCoConfig.resnet(dim=16, mlp_dim=32, K=32, T=0.2)
    state = moco.init(jax.random.PRNGKey(0), mcfg, cfg)
    proj_before = jax.tree_util.tree_leaves(state["base"]["projector"])
    out = ckpt_mod.resnet_arms_from_torchvision(state, sys_path, cfg)
    want = ckpt_mod.torch_resnet_to_params(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg,
        expect_fc=False)
    for tower in ("base", "momentum"):
        got = {k: out[tower]["encoder"][k] for k in ("stem", "stages")}
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(
                            {k: want[k] for k in ("stem", "stages")})):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(out["base"]["projector"]),
                    proj_before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ViT archs must reject the flag fast
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        pretrain.main(COMMON + [
            "--covid-ds", str(covid_root / "create_covid_dataset"),
            "--storage-root", str(tmp_path / "exp_rej"),
            "--pretrained-arms", sys_path,
            "-b", "8", "--epochs", "1", "--moco-dim", "16",
            "--moco-mlp-dim", "32", "--moco-k", "32", "--semi-ratios", "1"])

    # CLI end-to-end with the flag
    results = pretrain.main([
        "-a", "resnet18", "--img-size", "32", "--crop", "32",
        "--maintain-ratio", "--compute-dtype", "float32",
        "-j", "2", "--seed", "0",
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(tmp_path / "exp_arms"),
        "--exp-name", "arms", "--pretrained-arms", sys_path,
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "sgd",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_pretrain_cli_4ch(covid_root):
    """Stacked CXR-gray + Enh 4-channel input (builder_4ch.py:36-41)."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_4ch"
    results = pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoke4ch",
        "--in-chans", "4",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw", "--wd", "0.1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_finetune_cli_lp_and_ft(covid_root):
    from mfvit_tpu.cli import finetune
    out = covid_root / "exp_lp"
    results = finetune.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoke",
        "-b", "8", "--epochs", "2", "--cos", "--lr", "0.1",
        "--optimizer", "sgd", "--semi-ratios", "1"])
    assert len(results) == 1
    assert 0.0 <= results[0].test_acc <= 1.0
    assert np.isfinite(results[0].test_auc)
    # acc-twin protocol (finetune :581-601): test ran on val-ACC
    # improvement and its twin metrics are recorded
    assert np.isfinite(results[0].extra["test_auc_at_best_acc"])
    assert np.isfinite(results[0].extra["test_acc_at_best_auc"])
    exp = next(out.iterdir())
    assert (exp / "train_1_0" / "model_best").exists()
    assert (exp / "train_1_0_acc" / "model_best").exists()
    assert (exp / "results.json").exists()

    # FT (semi-supervised) on the fractional split
    out2 = covid_root / "exp_ft"
    results = finetune.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out2), "--exp-name", "smoke",
        "-b", "8", "--epochs", "1", "--cos", "--lr", "0.01",
        "--optimizer", "sgd", "--semi-supervised",
        "--semi-ratios", "0.5", "--draws", "1"])
    assert np.isfinite(results[0].test_auc)


def test_fuse_cli(covid_root):
    from mfvit_tpu.cli import fuse
    out = covid_root / "exp_fuse"
    results = fuse.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smoke",
        "-b", "8", "--epochs", "2", "--cos", "--lr", "1e-3",
        "--fusion-heads", "2", "--semi-ratios", "1"])
    assert len(results) == 1
    assert np.isfinite(results[0].test_auc)
    exp = next(out.iterdir())
    assert (exp / "train_1_0" / "model_best").exists()
    with open(exp / "results.json") as f:
        data = json.load(f)
    assert data[0]["ratio"] == 1


def test_fuse_cli_gpt(covid_root):
    """--fusion-arch gpt: the TransFuser-style alt fusion end to end."""
    from mfvit_tpu.cli import fuse
    out = covid_root / "exp_fuse_gpt"
    results = fuse.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "smokegpt",
        "-b", "8", "--epochs", "1", "--lr", "1e-3",
        "--fusion-arch", "gpt", "--gpt-layers", "1",
        "--semi-ratios", "1"])
    assert len(results) == 1
    assert np.isfinite(results[0].test_auc)
    # serve the GPT checkpoint through the infer CLI
    from mfvit_tpu.cli import infer
    exp = next(out.iterdir())
    res = infer.main(COMMON + [
        "--checkpoint", str(exp / "train_1_0" / "model_best"),
        "--manifest", str(covid_root / "create_covid_dataset" /
                          "test_ds.txt"),
        "--output", str(covid_root / "preds_gpt.json"), "-b", "4",
        "--fusion-arch", "gpt", "--gpt-layers", "1"])
    assert res["n"] == 4 and np.isfinite(res["metrics"]["auc"])


def test_infer_cli(covid_root):
    """fuse -> infer roundtrip: load the fusion checkpoint and predict."""
    from mfvit_tpu.cli import infer
    exp = next((covid_root / "exp_fuse").iterdir())
    ck = exp / "train_1_0" / "model_best"
    out = covid_root / "preds.json"
    res = infer.main(COMMON + [
        "--checkpoint", str(ck),
        "--manifest", str(covid_root / "create_covid_dataset" / "test_ds.txt"),
        "--output", str(out), "-b", "4", "--fusion-heads", "2",
        "--report-throughput"])
    assert res["n"] == 4
    assert "metrics" in res and np.isfinite(res["metrics"]["auc"])
    assert res["pairs_per_sec"] > 0 and res["pairs_per_sec_e2e"] > 0
    assert out.exists()


def test_make_splits(tmp_path):
    import subprocess, sys
    master = tmp_path / "all.txt"
    mf.write_covid_manifest(str(master), "/data", [f"i{k}.png" for k in range(30)],
                            [k % 3 for k in range(30)])
    out = tmp_path / "cds"
    r = subprocess.run(
        [sys.executable, "tools/make_splits.py", "--master", str(master),
         "--out", str(out), "--ratios", "0.5", "1", "--draws", "2",
         "--val-frac", "0.2", "--test-frac", "0.2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert (out / "val_ds.txt").exists() and (out / "test_ds.txt").exists()
    assert (out / "0.5_labeled_train_1.txt").exists()
    assert (out / "0.5_unlabeled_train_0.txt").exists()
    assert (out / "1_labeled_train_0.txt").exists()
    # labeled+unlabeled = train pool, disjoint
    lab = set(open(out / "0.5_labeled_train_0.txt").readlines())
    unlab = set(open(out / "0.5_unlabeled_train_0.txt").readlines())
    assert not (lab & unlab)


def test_pretrain_cli_byol_aug(covid_root):
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_byol"
    results = pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "byol",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "16",
        "--aug-setting", "moco_v2", "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_vit_only_clis_reject_resnet_and_4ch():
    """finetune/fuse/infer reject the pretrain-only resnet archs and the
    4-channel input cleanly instead of crashing in model init."""
    import argparse
    from mfvit_tpu.cli import common

    ns = argparse.Namespace(arch="resnet18", img_size=224, in_chans=3)
    with pytest.raises(SystemExit):
        common.get_vit_arch(ns)
    ns = argparse.Namespace(arch="vit_small", img_size=224, in_chans=4)
    with pytest.raises(SystemExit):
        common.get_vit_arch(ns)
    cfg = common.get_vit_arch(
        argparse.Namespace(arch="vit_small", img_size=224, in_chans=3))
    assert cfg.dim == 384


def test_finetune_fuse_reject_resume():
    """--resume matches the reference: its finetune resume path is dead
    code (finetune :400-429) — reject loudly, don't silently restart."""
    from mfvit_tpu.cli import finetune, fuse

    with pytest.raises(SystemExit, match="resume"):
        finetune.main(COMMON + ["--resume", "ckpt"])
    with pytest.raises(SystemExit, match="resume"):
        fuse.main(COMMON + ["--resume", "ckpt"])


def test_finetune_loads_orbax_pretrain_checkpoint(tmp_path):
    """load_backbone extracts the base encoder from a pretrain-written
    orbax checkpoint ({'state': <moco state>, 'epoch': ...}) — the orbax
    twin of the torch module.base_encoder surgery."""
    import argparse

    import jax

    from mfvit_tpu.cli import finetune
    from mfvit_tpu.exp import checkpoint as ckpt_mod
    from mfvit_tpu.nn import vit as vit_mod
    from mfvit_tpu.ssl import moco

    cfg = vit_mod.ViTConfig("t", img_size=32, patch=16, dim=32, depth=1,
                            heads=2)
    mcfg = moco.MoCoConfig(dim=8, mlp_dim=16, K=16)
    state = moco.init(jax.random.PRNGKey(0), mcfg, cfg)
    ckpt_mod.save(str(tmp_path / "ck"), {"state": state, "epoch": 3})

    args = argparse.Namespace(pretrained=str(tmp_path / "ck"))
    params = finetune.load_backbone(args, cfg)
    assert "blocks" in params and "head" not in params
    np.testing.assert_allclose(
        np.asarray(params["cls"]),
        np.asarray(state["base"]["encoder"]["cls"]))


def test_get_arch_uses_post_crop_input_size():
    """The network input size is the post-crop size (reference transform
    stack: resize shorter side to img_size, crop to crop)."""
    import argparse

    from mfvit_tpu.cli import common

    args = argparse.Namespace(arch="vit_small", img_size=256, crop=224,
                              in_chans=3)
    assert common.get_arch(args).img_size == 224
    args = argparse.Namespace(arch="vit_small", img_size=224, crop=0,
                              in_chans=3)
    assert common.get_arch(args).img_size == 224


def test_pretrain_progress_display_contract(covid_root, capfd):
    """--print-freq emits the reference hot-loop display lines
    (ProgressMeter: 'Epoch: [E][ i/N]\\tTime ...\\tData ...\\tLoss ...' —
    pretrain main :485-555 with meters.py formatting)."""
    import re

    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_disp"
    pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "disp",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "sgd", "--print-freq", "1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    cap = capfd.readouterr().out
    pat = (r"Epoch: \[0\]\[\d+/\d+\]\tTime +[\d.]+ \( *[\d.]+\)\t"
           r"Data +[\d.]+ \( *[\d.]+\)\tLoss [\d.e+-]+ \([\d.e+-]+\)")
    assert re.search(pat, cap), f"no progress line in output:\n{cap[-2000:]}"


def test_pretrain_cli_enh_cxr_pairing(covid_root):
    """--pairing enh_cxr: cross-modal q=Enh / k=CXR MoCo views with their
    own normalizations (Dataset_covid_LEnh_RCXR_2norms, loader.py:201-258)
    — the variant the reference's lineage experimented with but never
    wired into a main."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_xmod"
    results = pretrain.main(COMMON + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "xmod",
        "--pairing", "enh_cxr", "--per-enh", "0.7",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw", "--wd", "0.1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])


def test_pretrain_export_torch_rejects_unsupported_arch_fast():
    """--export-torch + conv-stem arch must fail at startup, not crash in
    the converter AFTER the full training grid ran."""
    import pytest

    from mfvit_tpu.cli import pretrain
    with pytest.raises(SystemExit, match="export-torch does not support"):
        pretrain.main(["-a", "vit_conv_small", "--export-torch",
                       "--covid-ds", "/nonexistent"])


def test_pretrain_dist_process_flags_alone_trigger_rendezvous(monkeypatch):
    """--dist-num-processes/--dist-process-id WITHOUT --distributed /
    --dist-coordinator must still rendezvous (the coordinator is
    auto-detected on TPU pods) — silently skipping init would degrade the
    launch into N independent duplicate single-process runs."""
    import pytest

    from mfvit_tpu.cli import pretrain

    calls = []

    class _Stop(Exception):
        pass

    def fake_init(coord, num_processes=None, process_id=None):
        calls.append((coord, num_processes, process_id))
        raise _Stop

    monkeypatch.setattr(pretrain.pmesh, "init_distributed", fake_init)
    with pytest.raises(_Stop):
        pretrain.main(["--dist-num-processes", "2", "--dist-process-id",
                       "0", "--covid-ds", "/nonexistent"])
    assert calls == [(None, 2, 0)]


def test_pretrain_cli_device_store(covid_root, capfd):
    """Default square-resize single-device runs keep the dataset resident
    in HBM: epoch >= 2 needs zero host work and zero per-step H2D
    (docs/PERF.md; the reference's answer is num_workers=12, pretrain
    main :425-442)."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_store"
    argv = [a for a in COMMON if a != "--maintain-ratio"]
    results = pretrain.main(argv + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "store",
        "--mesh-devices", "1",
        "-b", "8", "--epochs", "2", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "sgd",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])
    assert "device canvas store" in capfd.readouterr().out


def test_finetune_cli_device_store(covid_root, capfd):
    from mfvit_tpu.cli import finetune
    out = covid_root / "exp_ft_store"
    argv = [a for a in COMMON if a != "--maintain-ratio"]
    results = finetune.main(argv + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "ftstore",
        "--mesh-devices", "1",
        "-b", "8", "--epochs", "2", "--lr", "1e-3", "--optimizer", "sgd",
        "--semi-supervised", "--semi-ratios", "1"])
    assert np.isfinite(results[0].test_auc)
    assert "device canvas store" in capfd.readouterr().out


def test_fuse_cli_device_store(covid_root, capfd):
    from mfvit_tpu.cli import fuse
    out = covid_root / "exp_fuse_store"
    argv = [a for a in COMMON if a != "--maintain-ratio"]
    results = fuse.main(argv + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "fusestore",
        "--mesh-devices", "1",
        "-b", "8", "--epochs", "2", "--lr", "1e-3", "--optimizer", "sgd",
        "--fusion-heads", "2", "--semi-ratios", "1"])
    assert np.isfinite(results[0].test_auc)
    assert "device canvas store" in capfd.readouterr().out


def test_pretrain_cli_device_store_sharded(covid_root, capfd):
    """Multi-device run: the canvas store shards its table over the
    8-device data mesh (per-shard local shuffles, zero cross-device
    gather) and the MoCo parallel step consumes the already-sharded
    batches."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_store8"
    argv = [a for a in COMMON if a != "--maintain-ratio"]
    results = pretrain.main(argv + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "store8",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "sgd",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])
    assert "device canvas store" in capfd.readouterr().out


def test_pretrain_cli_4ch_device_store(covid_root, capfd):
    """The 4-channel stacked input rides the device store too (fills via
    Covid4chDataset, crops/augments 4ch canvases on-device)."""
    from mfvit_tpu.cli import pretrain
    out = covid_root / "exp_pre_4ch_store"
    argv = [a for a in COMMON if a != "--maintain-ratio"]
    results = pretrain.main(argv + [
        "--covid-ds", str(covid_root / "create_covid_dataset"),
        "--storage-root", str(out), "--exp-name", "store4ch",
        "--mesh-devices", "1", "--in-chans", "4",
        "-b", "8", "--epochs", "1", "--warmup-epochs", "0", "--cos",
        "--lr", "1e-3", "--optimizer", "adamw", "--wd", "0.1",
        "--moco-dim", "16", "--moco-mlp-dim", "32", "--moco-k", "32",
        "--semi-ratios", "1"])
    assert np.isfinite(results[0].extra["final_loss"])
    assert "device canvas store" in capfd.readouterr().out


def test_store_fill_reuses_shared_decode_cache(covid_root, monkeypatch):
    """Draw >= 2's store fill pass reads decoded canvases from the shared
    per-policy RAM cache instead of re-decoding its split from disk (the
    decode+resize fill prefix is deterministic across draws)."""
    import argparse

    from mfvit_tpu.cli import common
    from mfvit_tpu.data import host_transforms as ht

    ht._shared_decode_caches.clear()
    calls = {"n": 0}
    real = ht.decode_bgr

    def counting_decode(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(ht, "decode_bgr", counting_decode)
    args = argparse.Namespace(
        aug_device=True, maintain_ratio=False, device_store_mb=64,
        canvas_cache=True, canvas_cache_mb=64, img_size=32, crop=32,
        batch_size=8, workers=1)
    man = str(covid_root / "create_covid_dataset" / "1_labeled_train_0.txt")
    try:
        s1 = common.maybe_device_store(args, man, "data")
        assert s1 is not None
        n_first = calls["n"]
        assert n_first == s1.n  # fill pass decoded every image once
        common.release_store(s1)
        s2 = common.maybe_device_store(args, man, "data")  # "draw 2"
        assert s2 is not None
        assert calls["n"] == n_first  # zero re-decodes: cache hit
        common.release_store(s2)
    finally:
        ht._shared_decode_caches.clear()


def test_lazy_eval_stores_builds_once(monkeypatch):
    """The val/test eval-store pair is draw-independent: built on first
    use and reused across the whole (ratio, draw) grid."""
    from mfvit_tpu.cli import common

    built = []

    def fake_store(args, man, folder, **kw):
        built.append(man)
        return man

    monkeypatch.setattr(common, "maybe_eval_device_store", fake_store)
    get = common.lazy_eval_stores(None, "val.txt", "test.txt", "data")
    assert get() == ("val.txt", "test.txt")
    assert get() == ("val.txt", "test.txt")
    assert built == ["val.txt", "test.txt"]


def test_store_batch_iter_selects_by_store_mesh():
    """Feed selection keys on the store's OWN placement: an unsharded
    store yields index batches for the single-dispatch step; a sharded
    store yields its device-resident batches."""
    from mfvit_tpu.cli import common

    class FakeStore:
        mesh = None

        def iter_index_batches(self):
            return iter(["idx"])

        def __iter__(self):
            return iter(["sharded"])

    s = FakeStore()
    assert next(common.store_batch_iter(s, None, None)) == "idx"
    s.mesh = object()
    assert next(common.store_batch_iter(s, None, None)) == "sharded"
