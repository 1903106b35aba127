"""Data subsystem tests: manifests, host transforms, device-fused
augmentation, batch loader (reference semantics per SURVEY §2.4)."""
import os

import numpy as np
import pytest

import cv2
import jax
import jax.numpy as jnp
from PIL import Image

from mfvit_tpu.data import constants, datasets, device_aug, host_transforms as ht
from mfvit_tpu.data import manifest as mf
from mfvit_tpu.data.pipeline import BatchLoader


def _write_img(path, h=260, w=300, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    cv2.imwrite(path, img)
    return img


# ------------------------------------------------------------- constants

def test_norm_constants_match_reference():
    # image_transform.py:4-16
    assert constants.CXR_STD[0] == pytest.approx(round(0.085585 ** 0.5, 4), abs=1e-9)
    assert constants.DATA_MEAN == (0.5045, 0.5045, 0.5045)
    assert constants.TRAIN_MIX_STD == (0.1026, 0.2995, 0.3300)
    mean, std = constants.norm_stats("Train_Mix")
    assert mean == constants.TRAIN_MIX_MEAN and std == constants.TRAIN_MIX_STD
    with pytest.raises(KeyError):
        constants.norm_stats("nope")


# ------------------------------------------------------------- manifests

def test_covid_manifest_roundtrip(tmp_path):
    p = tmp_path / "train.txt"
    mf.write_covid_manifest(str(p), "/data/root", ["a.png", "b.png"], [2, 0])
    m = mf.parse_covid(str(p), "data")
    assert m.paths == ["/data/root/data/a.png", "/data/root/data/b.png"]
    assert m.labels.tolist() == [2, 0]
    pm = mf.parse_covid_paired(str(p))
    assert pm.paths_alt == ["/data/root/Train_Mix/a.png",
                            "/data/root/Train_Mix/b.png"]
    assert pm.labels.tolist() == [2, 0]


def test_chexpert_manifest(tmp_path):
    p = tmp_path / "chex.csv"
    p.write_text("idx,Path,Sex,Pneumonia\n0,x/img1.jpg,F,1.0\n"
                 "1,x/img2.jpg,M,-1.0\n2,x/img3.jpg,M,\n")
    m = mf.parse_chexpert(str(p), "/root_dir", "Pneumonia")
    assert m.paths[0] == "/root_dir/x/img1.jpg"
    # label remap {'1.0':1, '-1.0':1, '':0} — loader.py:48
    assert m.labels.tolist() == [1, 1, 0]


def test_split_manifest_naming(tmp_path):
    assert mf.split_manifest_path("/r", 0.1, 3).endswith("0.1_labeled_train_3.txt")
    assert mf.split_manifest_path("/r", 1.0, 0).endswith("1_labeled_train_0.txt")
    assert mf.split_manifest_path("/r", 0.0025, 0, labeled=False).endswith(
        "0.0025_unlabeled_train_0.txt")


# -------------------------------------------------------- host transforms

def test_resize_shorter_semantics():
    img = np.zeros((100, 200, 3), np.uint8)
    out = ht.resize_shorter(img, 224)
    assert out.shape == (224, 448, 3)
    out = ht.resize_shorter(np.zeros((300, 150, 3), np.uint8), 224)
    assert out.shape == (448, 224, 3)


def test_center_crop_matches_torchvision_formula():
    img = np.arange(7 * 9 * 3, dtype=np.uint8).reshape(7, 9, 3)
    out = ht.center_crop(img, 4, 4)
    # torchvision: top = round((7-4)/2)=2, left = round((9-4)/2)=2
    np.testing.assert_array_equal(out, img[2:6, 2:6])


def test_chexpert_transform_eval_shapes_and_values():
    img = np.full((260, 300, 3), 128, np.uint8)
    t = ht.ChexpertTransform(img_type="data", training=False)
    out = t(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    expect = (128 / 255.0 - 0.5045) / 0.2462
    assert out[112, 112, 0] == pytest.approx(expect, abs=1e-6)


def test_chexpert_transform_train_is_random_but_seeded():
    img = np.random.default_rng(0).integers(0, 255, (260, 300, 3), np.uint8)
    a = ht.ChexpertTransform(img_type="data", training=True, seed=1)(img)
    b = ht.ChexpertTransform(img_type="data", training=True, seed=1)(img)
    c = ht.ChexpertTransform(img_type="data", training=True, seed=2)(img)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (224, 224, 3)
    assert not np.array_equal(a, c)


def test_canvas_transform():
    img = np.random.default_rng(0).integers(0, 255, (250, 500, 3), np.uint8)
    out = ht.CanvasTransform(training=False)(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8
    out = ht.CanvasTransform(training=True, seed=0)(img)
    assert out.shape == (224, 224, 3)


# ------------------------------------------------------------ device aug

def test_device_rotate_matches_pil_nearest():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    angle = 7.5
    ours = np.asarray(device_aug._rotate_nearest(
        jnp.asarray(img, jnp.float32)[None], jnp.deg2rad(jnp.array([angle]))
    ))[0]
    pil = np.asarray(Image.fromarray(img).rotate(angle, resample=Image.NEAREST))
    np.testing.assert_array_equal(ours, pil.astype(np.float32))


def test_augment_batch_eval_is_pure_normalize():
    canv = np.full((2, 32, 32, 3), 255, np.uint8)
    out = device_aug.augment_batch(jax.random.PRNGKey(0), jnp.asarray(canv),
                                   img_type="data", training=False)
    mean, std = constants.norm_stats("data")
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               (1.0 - np.array(mean)) / np.array(std),
                               rtol=1e-5)


def test_augment_two_views_differ():
    canv = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3), np.uint8))
    q, k = device_aug.augment_two_views(jax.random.PRNGKey(0), canv,
                                        img_type="data")
    assert q.shape == k.shape == (4, 64, 64, 3)
    assert not np.array_equal(np.asarray(q), np.asarray(k))


# -------------------------------------------------------------- pipeline

class _ToyDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4, 4), i, np.float32), np.int32(i % 3)


def test_batch_loader_shapes_and_determinism():
    dl1 = BatchLoader(_ToyDS(10), 4, seed=7, num_workers=2)
    dl2 = BatchLoader(_ToyDS(10), 4, seed=7, num_workers=2)
    b1 = [b for b in dl1]
    b2 = [b for b in dl2]
    assert len(b1) == 2  # drop_last
    for (x1, y1), (x2, y2) in zip(b1, b2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    assert b1[0][0].shape == (4, 4, 4)
    # next epoch shuffles differently
    b3 = [b for b in dl1]
    assert not all(np.array_equal(a[0], b[0]) for a, b in zip(b1, b3))


def test_batch_loader_pad_final():
    dl = BatchLoader(_ToyDS(10), 4, drop_last=False, pad_final=True,
                     shuffle=False, num_workers=1)
    batches = [b for b in dl]
    assert len(batches) == 3
    assert all(b[0].shape[0] == 4 for b in batches)
    # wrapped padding repeats the head of the index order
    np.testing.assert_array_equal(batches[2][0][:, 0, 0], [8, 9, 0, 1])


# -------------------------------------------------------------- datasets

def test_covid_paired_dataset(tmp_path):
    root = tmp_path
    for folder in ("data", "Train_Mix"):
        os.makedirs(root / folder)
    imgs = {}
    for i, fn in enumerate(["a.png", "b.png"]):
        imgs[fn] = _write_img(str(root / "data" / fn), seed=i)
        _write_img(str(root / "Train_Mix" / fn), seed=10 + i)
    man = root / "train.txt"
    mf.write_covid_manifest(str(man), str(root), ["a.png", "b.png"], [1, 2])

    tf_cxr = ht.CanvasTransform(training=False)
    tf_enh = ht.CanvasTransform(training=False)
    ds = datasets.CovidPairedDataset(str(man), tf_cxr, tf_enh)
    cxr, enh, label = ds[1]
    assert cxr.shape == (224, 224, 3) and enh.shape == (224, 224, 3)
    assert label == 2
    assert not np.array_equal(cxr, enh)

    # single-flavor dataset decodes BGR identical to cv2
    ds1 = datasets.CovidDataset("data", str(man),
                                lambda x: x)  # identity transform
    raw, label0 = ds1[0]
    np.testing.assert_array_equal(raw, imgs["a.png"])
    assert label0 == 1


def test_covid_4ch_dataset(tmp_path):
    root = tmp_path
    for folder in ("data", "Train_Mix"):
        os.makedirs(root / folder)
        for i, fn in enumerate(["a.png"]):
            _write_img(str(root / folder / fn), seed=i + (folder == "data"))
    man = root / "t.txt"
    mf.write_covid_manifest(str(man), str(root), ["a.png"], [0])
    ds = datasets.Covid4chDataset(str(man), lambda x: x)
    img, _ = ds[0]
    assert img.shape[-1] == 4  # cat(cxr,enh)[:,:,2:] — loader.py:182


def test_chexpert_two_crops_dataset(tmp_path):
    """The reference Dataset's [q, k] return contract (loader.py:83-85):
    transform applied TWICE with independent draws per view."""
    os.makedirs(tmp_path / "x")
    _write_img(str(tmp_path / "x" / "img1.jpg"), 80, 90, seed=1)
    csv = tmp_path / "chex.csv"
    csv.write_text(f"idx,Path,Sex,Pneumonia\n0,x/img1.jpg,F,1.0\n")
    tf = ht.ChexpertTransform(img_size=32, crop=24, img_type="data",
                              training=True, rotate_deg=0.0, seed=0)
    ds = datasets.ChexpertTwoCropsDataset(str(tmp_path), str(csv), tf,
                                          "Pneumonia")
    q, k, label = ds[0]
    assert q.shape == k.shape == (24, 24, 3)
    assert label == 1
    assert not np.array_equal(q, k)  # independent crop windows
    q2, k2, _ = ds[0]  # deterministic per (epoch, idx, view)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(k, k2)


def test_chexpert_mix_dataset(tmp_path):
    import os as _os
    for folder in ("cx", "en"):
        _os.makedirs(tmp_path / folder / "x")
    _write_img(str(tmp_path / "cx" / "x" / "i.jpg"), seed=1)
    _write_img(str(tmp_path / "en" / "x" / "i.jpg"), seed=2)
    csv = tmp_path / "m.csv"
    csv.write_text("idx,Path,Pneumonia\n0,x/i.jpg,1.0\n")
    ident = lambda x: x
    ds = datasets.ChexpertMixDataset(
        str(tmp_path / "cx"), str(tmp_path / "en"), str(csv), ident, ident,
        "Pneumonia", per_enh=1.0, mode="mix")
    q, k, label = ds[0]
    assert label == 1
    assert not np.array_equal(q, k)  # per_enh=1 -> real Enh for k
    ds0 = datasets.ChexpertMixDataset(
        str(tmp_path / "cx"), str(tmp_path / "en"), str(csv), ident, ident,
        "Pneumonia", per_enh=0.0, mode="mix")
    q, k, _ = ds0[0]
    np.testing.assert_array_equal(q, k)  # per_enh=0 -> always CXR twice


def test_byol_and_mocov3_transforms():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (260, 300, 3), np.uint8)
    for variant in ("aug1", "aug2"):
        t = ht.ByolTransform(variant=variant, seed=3)
        out = t(img)
        assert out.shape == (224, 224, 3) and out.dtype == np.float32
    t1 = ht.ByolTransform(seed=5)(img)
    t2 = ht.ByolTransform(seed=5)(img)
    np.testing.assert_array_equal(t1, t2)

    m = ht.MoCoV3Transform(img_type="data", training=True, seed=0)
    assert m(img).shape == (224, 224, 3)
    # eval stack = Resize(256, shorter side) + CenterCrop(224) + normalize
    # (get_transform_type_mocov3, image_transform.py:120-124) — assert
    # against the composed primitives, not just the shape
    me = ht.MoCoV3Transform(img_type="data", training=False, seed=0)
    got = me(img)
    assert got.shape == (224, 224, 3)
    mean, std = ht.norm_stats("data")
    want = ht.to_float_chw_free(
        ht.center_crop(ht.resize_shorter(img, 256), 224, 224), mean, std)
    np.testing.assert_array_equal(got, want)


def test_rrc_blur_solarize_primitives():
    import random as _random
    rng = _random.Random(0)
    img = np.random.default_rng(1).integers(0, 255, (100, 150, 3), np.uint8)
    out = ht.random_resized_crop(img, 64, rng)
    assert out.shape == (64, 64, 3)
    assert ht.gaussian_blur(img, 1.0).shape == img.shape
    sol = ht.solarize(np.full((4, 4, 3), 200, np.uint8))
    assert (sol == 55).all()  # 255 - 200


def test_batch_loader_pad_final_tiny_dataset():
    """pad_final must fill a full batch even when the dataset is smaller
    than batch_size (static shapes for XLA)."""
    dl = BatchLoader(_ToyDS(3), 8, drop_last=False, pad_final=True,
                     shuffle=False, num_workers=1)
    batches = [b for b in dl]
    assert len(batches) == 1
    assert batches[0][0].shape[0] == 8
    np.testing.assert_array_equal(batches[0][0][:, 0, 0],
                                  [0, 1, 2, 0, 1, 2, 0, 1])


def test_device_prefetch():
    from mfvit_tpu.data.pipeline import device_prefetch
    batches = [(np.ones((2, 3), np.float32) * i, np.array([i])) for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[3][0]), 3.0)


def test_eval_transform_matches_reference_torchvision_pipeline():
    """The deterministic eval path (Resize -> CenterCrop -> ToTensor ->
    Normalize) matches the ACTUAL reference get_transform_type pipeline
    (image_transform.py:50-84) composed with real torchvision, bit-for-bit
    through the uint8 stages and to float32 precision after normalize."""
    import argparse
    import sys

    import pytest
    from PIL import Image
    tv = pytest.importorskip(
        "torchvision", reason="torchvision not in this image; the uint8 "
        "stages are separately proven bit-exact (resize/crop tests above)")
    if not hasattr(tv, "transforms"):  # a test stub, not the real package
        pytest.skip("torchvision is stubbed in this session")
    T = tv.transforms

    sys.path.insert(0, "/root/reference/moco_pretraining/moco")
    from aihc_utils import image_transform as ref_it

    from mfvit_tpu.data import host_transforms as ht

    rng = np.random.default_rng(14)
    img = rng.integers(0, 255, (250, 190, 3), np.uint8)

    for maintain_ratio in (True, False):
        for img_type in ("data", "Train_Mix"):
            args = argparse.Namespace(maintain_ratio=maintain_ratio,
                                      img_size=64, crop=56, rotate=0)
            ref_tf = T.Compose(ref_it.get_transform_type(
                args, training=False, img_type=img_type))
            ref = ref_tf(Image.fromarray(img)).numpy()      # (C, H, W)

            ours = ht.ChexpertTransform(
                img_size=64, crop=56, img_type=img_type, training=False,
                maintain_ratio=maintain_ratio)(img)          # (H, W, C)
            np.testing.assert_allclose(ours.transpose(2, 0, 1), ref,
                                       rtol=1e-5, atol=1e-5)


def test_loader_deterministic_across_worker_counts(tmp_path):
    """Seeded augmented batches are identical regardless of num_workers
    (per-sample RNG derivation) and vary across epochs."""
    from mfvit_tpu.data import pipeline

    root = tmp_path / "imgs"
    os.makedirs(root / "data")
    rng = np.random.default_rng(0)
    names, labels = [], []
    for i in range(12):
        fn = f"i_{i}.png"
        cv2.imwrite(str(root / "data" / fn),
                    rng.integers(0, 255, (40, 50, 3), np.uint8))
        names.append(fn)
        labels.append(i % 3)
    man = tmp_path / "m.txt"
    mf.write_covid_manifest(str(man), str(root), names, labels)

    def batches(workers):
        tf = ht.ChexpertTransform(img_size=32, crop=28, training=True,
                                  seed=7)
        ds = datasets.CovidDataset("data", str(man), tf)
        loader = pipeline.BatchLoader(ds, 4, shuffle=True, seed=0,
                                      drop_last=True, num_workers=workers)
        return [np.asarray(b[0]) for b in loader]

    a, b, c = batches(1), batches(4), batches(4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(b, c):
        np.testing.assert_array_equal(x, y)

    # second epoch reshuffles AND redraws augmentation
    tf = ht.ChexpertTransform(img_size=32, crop=28, training=True, seed=7)
    ds = datasets.CovidDataset("data", str(man), tf)
    loader = pipeline.BatchLoader(ds, 4, shuffle=False, seed=0,
                                  drop_last=True, num_workers=2)
    e0 = [np.asarray(b[0]) for b in loader]
    e1 = [np.asarray(b[0]) for b in loader]
    assert any(not np.array_equal(x, y) for x, y in zip(e0, e1))


def test_loader_propagates_worker_exceptions(tmp_path):
    """A failing __getitem__ raises in the consumer instead of hanging."""
    from mfvit_tpu.data import pipeline

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise FileNotFoundError("corrupt image")
            return np.zeros((4, 4, 3), np.uint8), np.int32(0)

    loader = pipeline.BatchLoader(Broken(), 4, shuffle=False,
                                  num_workers=2)
    with pytest.raises(FileNotFoundError):
        for _ in loader:
            pass


def test_crop_guards_and_canvas_crop():
    """crop > img_size fails loudly (torchvision RandomCrop semantics);
    CanvasTransform honors a crop smaller than img_size."""
    with pytest.raises(ValueError):
        ht.ChexpertTransform(img_size=32, crop=48, training=True)
    with pytest.raises(ValueError):
        ht.CanvasTransform(img_size=32, crop=48, training=True)
    img = np.random.default_rng(0).integers(0, 255, (50, 60, 3), np.uint8)
    out = ht.CanvasTransform(img_size=32, crop=24, training=True, seed=0)(img)
    assert out.shape == (24, 24, 3)
    out = ht.CanvasTransform(img_size=32, crop=24, training=False)(img)
    assert out.shape == (24, 24, 3)


def test_ssl_two_canvas_crops_are_independent(tmp_path):
    """VERDICT r2 #2: each MoCo view must get its OWN RandomCrop window
    (TwoCropsTransform applies the full stack twice — loader.py:13-22 +
    image_transform.py:58-63). The device-aug SSL path now feeds
    CovidTwoCropsDataset with a CanvasTransform: the two canvases of one
    sample must come from different crop offsets."""
    os.makedirs(tmp_path / "imgs" / "data")
    # wide gradient image: every crop offset yields distinct pixels
    grad = np.tile(np.arange(600, dtype=np.uint8)[None, :, None],
                   (300, 1, 3))
    cv2.imwrite(str(tmp_path / "imgs" / "data" / "g.png"), grad)
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), ["g.png"], [0])
    tf = ht.CanvasTransform(img_size=64, crop=32, training=True, seed=0)
    ds = datasets.CovidTwoCropsDataset("data", man, tf)
    diffs = 0
    for epoch in range(4):
        ds.set_epoch(epoch)
        q, k, _ = ds[0]
        assert q.shape == k.shape == (32, 32, 3)
        diffs += int(not np.array_equal(q, k))
    # independent uniform offsets over a 64x128-ish canvas collide rarely;
    # at least 3 of 4 epochs must show different crop windows
    assert diffs >= 3


def test_augment_two_views_accepts_separate_canvases():
    rng = np.random.default_rng(1)
    cq = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), np.uint8))
    ck = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3), np.uint8))
    q, k = device_aug.augment_two_views(
        jax.random.PRNGKey(0), cq, ck, img_type="data", rotate_deg=0.0,
        hflip=False)
    # with flip/rotation off, each view is exactly its own canvas
    mean, std = constants.norm_stats("data")
    np.testing.assert_allclose(
        np.asarray(q),
        (np.asarray(cq, np.float32) / 255.0 - mean) / std,
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(k),
        (np.asarray(ck, np.float32) / 255.0 - mean) / std,
        rtol=1e-4, atol=1e-6)


def test_batch_loader_set_epoch_resume_replays_order():
    """A loader resumed at epoch E (set_epoch) must replay the same
    shuffle order the uninterrupted run used for E."""
    a = BatchLoader(_ToyDS(12), 4, seed=3, num_workers=1)
    uninterrupted = []
    for _ in range(3):
        uninterrupted.append([b[1].tolist() for b in a])
    b_ = BatchLoader(_ToyDS(12), 4, seed=3, num_workers=1)
    b_.set_epoch(2)
    resumed = [b[1].tolist() for b in b_]
    assert resumed == uninterrupted[2]


def test_decode_resize_cache_hits_and_budget(tmp_path, monkeypatch):
    """DecodeResizeCache: one decode per image ever (epoch >= 2 is
    decode-free), byte budget respected, cached output identical to the
    uncached decode+resize."""
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    _write_img(p1, 120, 160, seed=1)
    _write_img(p2, 120, 160, seed=2)
    calls = []
    real = ht.decode_bgr
    monkeypatch.setattr(ht, "decode_bgr",
                        lambda path: (calls.append(path), real(path))[1])
    cache = ht.DecodeResizeCache(64, maintain_ratio=True)
    ref = ht.resize_shorter(real(p1), 64)
    for _ in range(3):
        out = cache(p1)
        np.testing.assert_array_equal(out, ref)
    assert calls.count(p1) == 1
    assert cache.nbytes == ref.nbytes
    # budget: second image does not fit -> decoded every time, not stored
    small = ht.DecodeResizeCache(64, limit_bytes=ref.nbytes)
    small(p1), small(p1), small(p2), small(p2)
    assert small.nbytes == ref.nbytes  # only p1 stored

def test_loader_with_cache_is_identical(tmp_path):
    """Batches from a cached loader equal the uncached ones across epochs
    (the cache covers only the deterministic decode+resize prefix)."""
    import argparse

    os.makedirs(tmp_path / "imgs" / "data")
    names = []
    for i in range(6):
        _write_img(str(tmp_path / "imgs" / "data" / f"i{i}.png"),
                   90, 120, seed=i)
        names.append(f"i{i}.png")
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), names,
                            [i % 3 for i in range(6)])

    from mfvit_tpu.cli import common

    def mk(cache):
        args = argparse.Namespace(
            batch_size=3, img_size=48, crop=32, maintain_ratio=True,
            aug_device=True, workers=2, rotate=10.0,
            canvas_cache=cache, canvas_cache_mb=64)
        return common.make_covid_loader(args, man, "data", training=True,
                                        seed=0)
    a, b = mk(False), mk(True)
    for _ in range(2):  # epoch 2 hits the cache
        for (xa, la), (xb, lb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(la, lb)


def test_store_budget_released_across_draws(tmp_path):
    """Per-draw train stores return their HBM reservation on release, so
    a multi-draw grid keeps fitting the shared --device-store-mb budget
    (draw >= 1 used to fall back silently to the streaming feed)."""
    import argparse

    from mfvit_tpu.cli import common

    os.makedirs(tmp_path / "imgs" / "data")
    names = []
    for i in range(4):
        _write_img(str(tmp_path / "imgs" / "data" / f"s{i}.png"),
                   40, 50, seed=i)
        names.append(f"s{i}.png")
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), names,
                            [i % 3 for i in range(4)])
    args = argparse.Namespace(
        batch_size=2, img_size=16, crop=16, maintain_ratio=False,
        aug_device=True, workers=1, rotate=0.0,
        canvas_cache=False, canvas_cache_mb=0, device_store_mb=1)
    nbytes = common._store_nbytes(4, 16, 3, 1)  # canvases + label rows
    budget = common.StoreBudget(0)
    budget.left = nbytes  # exactly ONE train store fits at a time
    s1 = common.maybe_device_store(args, man, "data", seed=0,
                                   budget=budget)
    assert s1 is not None
    assert common.maybe_device_store(args, man, "data", seed=1,
                                     budget=budget) is None
    common.release_store(s1)  # draw 0 ended
    s2 = common.maybe_device_store(args, man, "data", seed=1,
                                   budget=budget)
    assert s2 is not None
    common.release_store(s2)
    common.release_store(s2)  # idempotent
    common.release_store(None)  # safe on streaming fallback
    assert budget.left == nbytes


def test_store_nbytes_multiprocess_reserves_local_share_only():
    """On a multi-process mesh each host pins only its own contiguous row
    block (hostput.local_row_block), so the per-host --device-store-mb
    reservation must divide by the process count — charging the global
    table would spuriously reject sharded stores that fit local HBM."""
    from mfvit_tpu.cli import common
    full = common._store_nbytes(10, 16, 3, 4)  # wrap-padded 10 -> 12
    assert full == 12 * (16 * 16 * 3 + 8)
    assert common._store_nbytes(10, 16, 3, 4, n_proc=2) == full // 2
    assert common._store_nbytes(10, 16, 3, 4, n_proc=1) == full
    # single-device fills never shard across processes
    assert common._store_nbytes(4, 16, 3, 1) == 4 * (16 * 16 * 3 + 8)


def test_decode_cache_shared_across_loaders(tmp_path, monkeypatch):
    """All loaders of a run (train/val/test, every draw) share ONE decode
    cache per policy: each image is decoded once per process, and the RAM
    budget is not multiplied by the loader count."""
    import argparse

    from mfvit_tpu.cli import common

    os.makedirs(tmp_path / "imgs" / "data")
    names = []
    for i in range(4):
        _write_img(str(tmp_path / "imgs" / "data" / f"c{i}.png"),
                   50, 60, seed=i)
        names.append(f"c{i}.png")
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), names,
                            [i % 3 for i in range(4)])
    calls = []
    real = ht.decode_bgr
    monkeypatch.setattr(ht, "decode_bgr",
                        lambda path: (calls.append(path), real(path))[1])
    # distinctive budget -> fresh shared-cache registry entry
    args = argparse.Namespace(
        batch_size=2, img_size=24, crop=24, maintain_ratio=True,
        aug_device=True, workers=1, rotate=0.0,
        canvas_cache=True, canvas_cache_mb=63)
    a = common.make_covid_loader(args, man, "data", training=True, seed=0)
    b = common.make_covid_loader(args, man, "data", training=False, seed=0)
    for _ in a:
        pass
    n_after_first = len(calls)
    assert n_after_first == 4  # one decode per image
    for _ in b:  # second loader, same policy -> zero fresh decodes
        pass
    assert len(calls) == n_after_first


def test_rotate_then_crop_matches_full_rotation_then_slice():
    """The fused _rotate_crop_nearest gather == rotate the FULL canvas
    (the PIL-parity _rotate_nearest) then slice the crop window — i.e.
    the store paths now run the reference's rotate-THEN-crop order
    (image_transform.py:58-63) at crop-only gather cost."""
    import jax
    import jax.numpy as jnp

    from mfvit_tpu.data import device_aug

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(3, 20, 24, 3)).astype(np.float32))
    angles = jnp.asarray([0.12, -0.15, 0.0])
    tops = jnp.asarray([0, 3, 5])
    lefts = jnp.asarray([2, 0, 7])
    full = device_aug._rotate_nearest(imgs, angles)
    want = np.stack([
        np.asarray(full[i, int(tops[i]):int(tops[i]) + 12,
                        int(lefts[i]):int(lefts[i]) + 12])
        for i in range(3)])
    got = device_aug._rotate_crop_nearest(imgs, angles, tops, lefts, 12)
    np.testing.assert_array_equal(np.asarray(got), want)

    # augment_train_canvas API: shape, dtype, and the rotate_deg=0 path
    # reducing to plain crop + normalize
    out = device_aug.augment_train_canvas(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), np.uint8)),
        crop=24, img_type="data", rotate_deg=10.0)
    assert out.shape == (4, 24, 24, 3) and out.dtype == jnp.float32
    out0 = device_aug.augment_train_canvas(
        jax.random.PRNGKey(1),
        jnp.asarray(rng.integers(0, 255, (4, 32, 32, 3), np.uint8)),
        crop=24, img_type="data", rotate_deg=0.0, hflip=False)
    assert out0.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(out0)).all()


def test_random_crop_batch_matches_host_semantics():
    """Device random crop: every output is a contiguous (crop, crop)
    window of its source, offsets cover the full inclusive range."""
    from mfvit_tpu.data import device_aug
    rng = np.random.default_rng(0)
    canv = jnp.asarray(rng.integers(0, 255, (16, 12, 14, 3), np.uint8))
    out = device_aug.random_crop_batch(jax.random.PRNGKey(0), canv, 8)
    assert out.shape == (16, 8, 8, 3)
    src = np.asarray(canv)
    o = np.asarray(out)
    seen = set()
    for b in range(16):
        found = False
        for t in range(12 - 8 + 1):
            for le in range(14 - 8 + 1):
                if np.array_equal(o[b], src[b, t:t + 8, le:le + 8]):
                    seen.add((t, le))
                    found = True
        assert found, f"sample {b} is not a window of its source"
    assert len(seen) > 3  # offsets actually vary


def test_device_canvas_store_roundtrip_and_shuffle():
    from mfvit_tpu.data import device_store

    class _CanvasDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((6, 6, 3), i, np.uint8), np.int32(i % 3))

    store = device_store.fill_from_dataset(_CanvasDS(), batch_size=4,
                                           seed=5)
    assert len(store) == 2
    store.set_epoch(0)
    e0 = [(np.asarray(c), np.asarray(l)) for c, l in store]
    assert all(c.shape == (4, 6, 6, 3) for c, _ in e0)
    # labels consistent with canvases (gather uses the same indices)
    for c, l in e0:
        np.testing.assert_array_equal(c[:, 0, 0, 0] % 3, l)
    # same epoch -> same order (determinism); next epoch -> different
    store.set_epoch(0)
    e0b = [(np.asarray(c), np.asarray(l)) for c, l in store]
    np.testing.assert_array_equal(e0[0][0], e0b[0][0])
    e1 = [(np.asarray(c), np.asarray(l)) for c, l in store]  # epoch 1
    assert not np.array_equal(e0[0][0], e1[0][0])
    # BatchLoader shuffle parity: same rng stream
    idx = np.arange(10)
    np.random.default_rng(5 + 0).shuffle(idx)
    np.testing.assert_array_equal(e0[0][0][:, 0, 0, 0], idx[:4])


def test_device_canvas_store_sharded_over_mesh():
    """Sharded store (8-device data mesh): the table rows live
    shard-local, every sample appears exactly once per epoch, batches
    come out sharded over the data axis, per-shard shuffles differ
    across epochs."""
    from mfvit_tpu.data import device_store
    from mfvit_tpu.parallel import mesh as pmesh

    class _CanvasDS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.uint8), np.int32(i % 3))

    m = pmesh.make_mesh(8)
    store = device_store.fill_from_dataset(_CanvasDS(), batch_size=16,
                                           seed=3, mesh=m)
    assert len(store) == 2
    store.set_epoch(0)
    seen = []
    for canv, lab in store:
        assert canv.shape == (16, 4, 4, 3)
        # batch is sharded over the data axis
        assert canv.sharding.spec == jax.sharding.PartitionSpec("data")
        np.testing.assert_array_equal(np.asarray(canv)[:, 0, 0, 0] % 3,
                                      np.asarray(lab))
        seen.extend(np.asarray(canv)[:, 0, 0, 0].tolist())
    assert sorted(seen) == list(range(32))  # exactly once per epoch
    e1 = [np.asarray(c)[:, 0, 0, 0].tolist() for c, _ in store]  # epoch 1
    assert sorted(sum(e1, [])) == list(range(32))
    assert sum(e1, []) != seen  # order changes across epochs


def test_eval_device_store_matches_batchloader(tmp_path):
    """Eval store batches must be BIT-identical to the streaming eval
    loader's (same deterministic canvases, same order, same wrap-pad) —
    metrics are then trivially unchanged."""
    import argparse

    from mfvit_tpu.cli import common

    os.makedirs(tmp_path / "imgs" / "data")
    names = []
    for i in range(5):
        _write_img(str(tmp_path / "imgs" / "data" / f"e{i}.png"),
                   70, 90, seed=i)
        names.append(f"e{i}.png")
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), names,
                            [i % 3 for i in range(5)])
    args = argparse.Namespace(
        batch_size=2, img_size=32, crop=24, maintain_ratio=False,
        aug_device=True, workers=2, rotate=0.0,
        canvas_cache=False, canvas_cache_mb=0, device_store_mb=64)
    vl = common.make_covid_loader(args, man, "data", training=False,
                                  seed=0)
    st = common.maybe_eval_device_store(args, man, "data")
    assert st is not None
    assert len(st.ds) == len(vl.ds) == 5
    lb = [(np.asarray(c), np.asarray(l)) for c, l in vl]
    sb = [(np.asarray(c), np.asarray(l)) for c, l in st]
    assert len(lb) == len(sb)
    for (lc, ll), (sc, sl) in zip(lb, sb):
        np.testing.assert_array_equal(lc, sc)
        np.testing.assert_array_equal(ll, sl)


def test_host_rotate_crop_window_matches_pil_rotate_then_slice():
    """The STREAMING feed's host fused gather (rotate_crop_window) is
    bit-exact vs PIL Image.rotate of the full canvas followed by a slice
    — the host twin of test_rotate_then_crop_matches_full_rotation_then_
    slice, closing PARITY.md divergence #7 for the streaming path
    (VERDICT r4 #2; reference order image_transform.py:58-63)."""
    from mfvit_tpu.data import host_transforms as ht

    rng = np.random.default_rng(7)
    for (h, w), angle, (top, left), crop in [
            ((230, 197), 8.31, (3, 12), 180),
            ((64, 96), -9.97, (0, 0), 56),
            ((96, 64), 0.5, (40, 7), 56),
            ((64, 64), -0.75, (5, 5), 56)]:
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        want = ht.rotate(img, angle)[top:top + crop, left:left + crop]
        got = ht.rotate_crop_window(img, angle, top, left, crop, crop)
        np.testing.assert_array_equal(got, want)
    # 4-channel canvases (the builder_4ch stacked input) gather too
    img4 = rng.integers(0, 255, (48, 48, 4), np.uint8)
    got4 = ht.rotate_crop_window(img4, 5.0, 2, 3, 32, 32)
    want4 = np.stack([
        ht.rotate(np.ascontiguousarray(img4[..., c]), 5.0)[2:34, 3:35]
        for c in range(4)], axis=-1)
    np.testing.assert_array_equal(got4, want4)


def test_canvas_transform_reference_order_streaming():
    """CanvasTransform with hflip/rotate_deg set (the streaming training
    feed) applies the reference flip -> rotate(FULL canvas) -> crop order
    with the torchvision draw sequence; defaults keep the crop-only
    producer (the store-fill / crop-first ablation behavior)."""
    import random as pyrandom

    from mfvit_tpu.data import host_transforms as ht

    rng = np.random.default_rng(8)
    raw = rng.integers(0, 255, (150, 120, 3), np.uint8)
    seed, ctx = 5, (0, 3)
    tf = ht.CanvasTransform(img_size=64, crop=56, training=True,
                            maintain_ratio=True, rotate_deg=10.0,
                            hflip=True, seed=seed)
    got = tf(raw, ctx)
    assert got.shape == (56, 56, 3) and got.dtype == np.uint8

    # replay the exact draw sequence: flip, angle, top, left
    r = pyrandom.Random(hash((seed,) + ctx))
    img = ht.resize_shorter(raw, 64)
    if r.random() < 0.5:
        img = img[:, ::-1]
    angle = r.uniform(-10.0, 10.0)
    h, w = img.shape[:2]
    top = r.randint(0, h - 56)
    left = r.randint(0, w - 56)
    want = ht.rotate(np.ascontiguousarray(img),
                     angle)[top:top + 56, left:left + 56]
    np.testing.assert_array_equal(got, want)

    # defaults (store fill / crop-first ablation): pure random crop of
    # the unrotated canvas
    tf0 = ht.CanvasTransform(img_size=64, crop=56, training=True,
                             maintain_ratio=True, seed=seed)
    got0 = tf0(raw, ctx)
    r0 = pyrandom.Random(hash((seed,) + ctx))
    want0 = ht.random_crop(ht.resize_shorter(raw, 64), 56, 56, r0)
    np.testing.assert_array_equal(got0, want0)


def test_stream_train_view_orders():
    """stream_train_view: reference order (default) only normalizes the
    host-augmented canvas; the crop-first ablation still flips/rotates
    on-device."""
    import argparse

    import jax

    from mfvit_tpu.cli import common
    from mfvit_tpu.data import device_aug

    rng = np.random.default_rng(9)
    canv = jnp.asarray(rng.integers(0, 255, (2, 16, 16, 3), np.uint8))
    base = argparse.Namespace(compute_dtype="float32", rotate=10.0)

    ref = argparse.Namespace(**vars(base), aug_order="reference")
    out = common.stream_train_view(ref, jax.random.PRNGKey(0), canv, "data")
    want = device_aug.augment_batch(jax.random.PRNGKey(1), canv,
                                    img_type="data", training=False,
                                    out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    ab = argparse.Namespace(**vars(base), aug_order="crop-first")
    out2 = common.stream_train_view(ab, jax.random.PRNGKey(0), canv, "data")
    want2 = device_aug.augment_batch(jax.random.PRNGKey(0), canv,
                                     img_type="data", training=True,
                                     rotate_deg=10.0,
                                     out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(want2))
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_eval_device_store_disabled_multiprocess(tmp_path, monkeypatch):
    """Eval device stores must NOT build on multi-process meshes: each
    process would pin the FULL eval table and the multi-process eval
    runner treats every process's batch as its local row block, so
    identical full-table batches would enter the global batch once per
    process — double-counting every sample and truncating the tail at
    the Evaluator's n_total trim. The streaming eval feed process-slices
    and stays correct."""
    import argparse

    from mfvit_tpu.cli import common
    from mfvit_tpu.data import manifest as mf

    os.makedirs(tmp_path / "imgs" / "data")
    _write_img(str(tmp_path / "imgs" / "data" / "m0.png"), 70, 90, seed=0)
    man = str(tmp_path / "man.txt")
    mf.write_covid_manifest(man, str(tmp_path / "imgs"), ["m0.png"], [0])
    args = argparse.Namespace(
        batch_size=2, img_size=32, crop=24, maintain_ratio=False,
        aug_device=True, workers=1, rotate=0.0,
        canvas_cache=False, canvas_cache_mb=0, device_store_mb=64)
    assert common.maybe_eval_device_store(args, man, "data") is not None
    monkeypatch.setattr(common.jax, "process_count", lambda: 2)
    assert common.maybe_eval_device_store(args, man, "data") is None


def test_device_canvas_store_sharded_shuffle_false_and_small_shard_pad():
    """Two _iter_sharded contracts: (1) shuffle=False yields deterministic
    in-order rows per shard (it previously shuffled unconditionally);
    (2) the final-batch wrap-pad TILES the shard like iter_index_batches,
    so shards smaller than the pad need (m < local_bs - len(c)) still
    fill the static batch instead of yielding a short global batch."""
    from mfvit_tpu.data import device_store
    from mfvit_tpu.parallel import mesh as pmesh

    class _CanvasDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.uint8), np.int32(i % 3))

    m = pmesh.make_mesh(8)
    # (1) shuffle=False: row order is the identity per shard, every epoch
    store = device_store.fill_from_dataset(_CanvasDS(32), batch_size=16,
                                           seed=3, mesh=m, shuffle=False)
    for _ in range(2):
        rows = [np.asarray(c)[:, 0, 0, 0].tolist() for c, _ in store]
        # shard k holds rows [4k, 4k+4); each batch takes 2 in order
        assert rows[0] == sum(([4 * k, 4 * k + 1] for k in range(8)), [])
        assert rows[1] == sum(([4 * k + 2, 4 * k + 3] for k in range(8)), [])

    # (2) small shards: n=16 over 8 devices -> m=2 rows/shard; batch 64
    # -> local_bs=8 needs each shard tiled 4x (single-concat padding
    # yielded 4 rows/shard and a shape error downstream)
    store = device_store.fill_from_dataset(_CanvasDS(16), batch_size=64,
                                           seed=0, mesh=m, shuffle=False,
                                           drop_last=False)
    batches = [(np.asarray(c), np.asarray(l)) for c, l in store]
    assert len(batches) == 1
    canv, lab = batches[0]
    assert canv.shape == (64, 4, 4, 3)
    np.testing.assert_array_equal(canv[:, 0, 0, 0] % 3, lab)
    # every real row appears (4x each, tiled)
    assert sorted(set(canv[:, 0, 0, 0].tolist())) == list(range(16))


def test_mix_draw_decorrelated_from_transform_flip(tmp_path):
    """The per-sample mix decision and the transform's augmentation
    stream must come from DIFFERENT Random streams (the mix context is
    salted): unsalted, the transform's first draw (hflip) was
    bit-identical to the already-conditioned mix draw, so at per_enh=0.5
    the CXR-query branch could never flip. Both branches must now show
    flipped AND unflipped queries."""
    from mfvit_tpu.data import datasets
    from mfvit_tpu.data import host_transforms as ht2
    from mfvit_tpu.data import manifest as mf

    n = 64
    names = [f"s{i}.png" for i in range(n)]
    mf.write_covid_manifest(str(tmp_path / "m.txt"), str(tmp_path),
                            names, [0] * n)
    grad = np.tile(np.arange(8, dtype=np.uint8)[None, :, None] * 30,
                   (8, 1, 3))

    def decode(path):
        # enh flavor constant, cxr flavor left-right gradient
        return (np.full((8, 8, 3), 7, np.uint8)
                if "Train_Mix" in path else grad.copy())

    tf = ht2.ChexpertTransform(img_size=8, crop=8, training=True,
                               maintain_ratio=False, rotate_deg=0.0,
                               seed=0, normalize=False)
    ds = datasets.CovidEnhCxrDataset(str(tmp_path / "m.txt"), tf, tf,
                                     per_enh=0.5, seed=0, decode=decode)
    flips = []
    for i in range(n):
        q, _, _ = ds[i]
        if np.asarray(q).std() < 1e-6:
            continue  # enh branch (constant image) — flip undetectable
        col = np.asarray(q)[0, :, 0]
        flips.append(bool(col[0] > col[-1]))
    assert len(flips) > 10  # both branches actually occur
    assert any(flips) and not all(flips)  # CXR queries flip ~half the time
