"""Data pipeline tests: aug properties, dataset modes, sharded loader."""

import numpy as np
import pytest
from PIL import Image

from semivl_tpu.data import transforms as T
from semivl_tpu.data.dataset import SemiDataset, split_path
from semivl_tpu.data.loader import ShardedLoader, epoch_permutation

from synth_data import make_synth_dataset, synth_cfg


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('synthds'))
    paths = make_synth_dataset(root)
    return root, paths


def test_cutmix_box_properties(rng):
    """Box area in [2%,40%], aspect in [0.3,3.3] (transform.py:66-84)."""
    hits = 0
    for _ in range(200):
        box = T.obtain_cutmix_box(64, rng)
        area = box.sum()
        if area == 0:
            continue
        hits += 1
        assert 0.005 * 64 * 64 <= area <= 0.45 * 64 * 64
        ys, xs = np.where(box == 1)
        h = ys.max() - ys.min() + 1
        w = xs.max() - xs.min() + 1
        assert area == h * w  # single rectangle
    assert 50 < hits < 150  # p=0.5


def test_normalize_range():
    img = Image.new('RGB', (8, 8), (124, 116, 104))  # approx ImageNet mean
    arr = T.normalize(img)
    assert arr.shape == (8, 8, 3)
    assert np.abs(arr).max() < 0.1


def test_mmseg_resize_val_min_size():
    img = Image.new('RGB', (300, 400))
    out = T.mmseg_resize_val(img, (2048, 512), min_size=512)
    assert min(out.size) == 512
    # aspect preserved within rounding
    assert abs(out.size[1] / out.size[0] - 400 / 300) < 0.01


def test_mmseg_resize_val_short_side_never_below_min():
    """Regression: mmseg keeps the derived long-edge target float and
    rounds ONCE (int(x*factor+0.5)); truncating it to int first made
    333x500 come out 511x768 (mmseg: 512x769) — below crop_size, which
    rerouted those val images to the slow host predict path (round 5)."""
    # (w, h) -> expected mmseg output (w, h)
    cases = {
        (500, 333): (769, 512),
        (500, 375): (683, 512),
        (375, 500): (512, 683),
        (500, 500): (512, 512),
        (500, 366): (699, 512),
    }
    for (w, h), want in cases.items():
        out = T.mmseg_resize_val(Image.new('RGB', (w, h)),
                                 (2048, 512), min_size=512)
        assert out.size == want, ((w, h), out.size, want)
    # invariant sweep: the min_size path replaces img_scale with targets
    # derived from the image aspect, so the short side lands exactly on
    # min_size for every aspect ratio
    for w in range(200, 900, 37):
        for h in (200, 333, 401, 512, 700):
            out = T.mmseg_resize_val(Image.new('RGB', (w, h)),
                                     (2048, 512), min_size=512)
            assert min(out.size) >= 512, ((w, h), out.size)


def test_pad_and_crop_ignore_fill(rng):
    img = Image.new('RGB', (30, 40), (10, 10, 10))
    mask = Image.fromarray(np.zeros((40, 30), np.uint8))
    img_c, mask_c = T.pad_and_crop(img, mask, 64, 254, rng)
    assert img_c.size == (64, 64)
    m = np.asarray(mask_c)
    assert (m == 254).sum() == 64 * 64 - 40 * 30  # padding marked


def test_dataset_modes(synth_root):
    root, paths = synth_root
    cfg = synth_cfg(root)

    ds_l = SemiDataset(cfg, 'train_l', id_path=paths['labeled'], nsample=6)
    assert len(ds_l) == 6  # oversampled 2 -> 6
    s = ds_l.get(0)
    assert s['img'].shape == (64, 64, 3) and s['img'].dtype == np.float32
    assert s['mask'].shape == (64, 64) and s['mask'].dtype == np.int32

    ds_u = SemiDataset(cfg, 'train_u', id_path=paths['unlabeled'])
    a, b = ds_u.get_pair(0, epoch=3)
    for s in (a, b):
        assert set(s) == {'img_w', 'img_s1', 'img_s2', 'ignore_mask',
                          'cutmix_box1', 'cutmix_box2'}
        assert s['img_s1'].shape == (64, 64, 3)
        assert set(np.unique(s['ignore_mask'])) <= {0, 255}
    # independent augmentations of the same underlying image
    assert np.abs(a['img_w'] - b['img_w']).max() > 1e-3

    ds_v = SemiDataset(cfg, 'val', id_path=paths['val'])
    v = ds_v.get(0)
    assert v['mask'].shape == (80, 96)  # original mask size
    assert isinstance(v['id'], str)


def test_reduce_zero_label(synth_root, tmp_path):
    """ADE remap (reference semi.py:46-51): 0 -> 255 (ignore), k -> k-1."""
    import os
    from PIL import Image
    root, _ = synth_root
    mask = np.zeros((16, 16), np.uint8)
    mask[0] = 0      # background -> ignore
    mask[1] = 1      # -> 0
    mask[2] = 150    # -> 149
    mask[3] = 255    # stays ignore
    Image.fromarray(mask).save(os.path.join(root, 'masks', 'rz.png'))
    img = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(img).save(os.path.join(root, 'imgs', 'rz.png'))
    idp = str(tmp_path / 'rz.txt')
    with open(idp, 'w') as f:
        f.write('imgs/rz.png masks/rz.png\n')
    cfg = synth_cfg(root)
    cfg['reduce_zero_label'] = True
    ds = SemiDataset(cfg, 'val', id_path=idp)
    v = ds.get(0)
    got = np.asarray(v['mask'])
    assert set(np.unique(got[0])) == {255}
    assert set(np.unique(got[1])) == {0}
    assert set(np.unique(got[2])) == {149}
    assert set(np.unique(got[3])) == {255}


def test_dataset_determinism(synth_root):
    root, paths = synth_root
    cfg = synth_cfg(root)
    ds = SemiDataset(cfg, 'train_l', id_path=paths['labeled'])
    s1 = ds.get(0, epoch=1)
    s2 = ds.get(0, epoch=1)
    np.testing.assert_array_equal(s1['img'], s2['img'])
    s3 = ds.get(0, epoch=2)
    assert np.abs(s1['img'] - s3['img']).max() > 1e-3


def test_epoch_permutation_distributed_semantics():
    idx = epoch_permutation(10, epoch=0, world=4, seed=0)
    assert idx.shape == (4, 3)  # ceil(10/4)=3 per rank, wrap-padded
    flat = idx.reshape(-1)
    assert set(flat) == set(range(10))  # covers all
    # deterministic per epoch
    np.testing.assert_array_equal(idx, epoch_permutation(10, 0, 4, 0))
    assert not np.array_equal(idx, epoch_permutation(10, 1, 4, 0))


def test_sharded_loader(synth_root):
    root, paths = synth_root
    cfg = synth_cfg(root)
    ds = SemiDataset(cfg, 'train_u', id_path=paths['unlabeled'])
    loader = ShardedLoader(ds, batch_size=1, world=2, pair=True, seed=0)
    assert len(loader) == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b['img_w'].shape == (2, 64, 64, 3)
    assert b['img_w_other'].shape == (2, 64, 64, 3)
    assert b['cutmix_box1'].shape == (2, 64, 64)

    ds_l = SemiDataset(cfg, 'train_l', id_path=paths['labeled'],
                       nsample=len(ds.ids))
    loader_l = ShardedLoader(ds_l, batch_size=1, world=2, seed=0)
    bl = next(iter(loader_l.epoch(0)))
    assert bl['img'].shape == (2, 64, 64, 3)
    assert bl['mask'].shape == (2, 64, 64)


def test_bundled_split_path():
    p = split_path('pascal', '92', 'labeled')
    assert p.endswith('pascal/92/labeled.txt')
    import os
    assert os.path.isfile(p)


def test_sharded_loader_multihost_partition(synth_root):
    """Two hosts' loaders must cover disjoint rank sets whose union is the
    single-host global batch."""
    root, paths = synth_root
    cfg = synth_cfg(root)
    ds = SemiDataset(cfg, 'train_l', id_path=paths['labeled'], nsample=8)
    full = ShardedLoader(ds, batch_size=1, world=4, seed=0)
    h0 = ShardedLoader(ds, batch_size=1, world=4, seed=0,
                       process_index=0, process_count=2)
    h1 = ShardedLoader(ds, batch_size=1, world=4, seed=0,
                       process_index=1, process_count=2)
    bf = next(iter(full.epoch(0)))
    b0 = next(iter(h0.epoch(0)))
    b1 = next(iter(h1.epoch(0)))
    assert b0['img'].shape[0] == b1['img'].shape[0] == 2
    np.testing.assert_allclose(
        np.concatenate([b0['img'], b1['img']]), bf['img'])
