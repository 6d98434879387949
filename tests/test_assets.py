"""Data-asset integrity: palettes, class lists, splits, text embeddings."""

import os

import numpy as np

from semivl_tpu.datasets import CLASSES, NUM_CLASSES, get_palette
from semivl_tpu.text import (
    get_class_to_concept_idxs,
    load_text_embedding,
    text_embedding_path,
)
from semivl_tpu.text.concepts import (
    CITYSCAPES_CLASSES_W_CONCEPTS3,
    VOC12_WBG_CLASSES_W_CONCEPTS4,
    flatten_class_concepts,
)

ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      'semivl_tpu', 'assets')


def test_class_counts():
    for ds, n in NUM_CLASSES.items():
        assert len(CLASSES[ds]) == n


def test_voc_palette_values():
    pal = get_palette('pascal')
    # Canonical VOC colors (reference datasets/palettes.py:26-33).
    assert tuple(pal[0]) == (0, 0, 0)
    assert tuple(pal[1]) == (128, 0, 0)
    assert tuple(pal[15]) == (192, 128, 128)
    assert tuple(pal[20]) == (0, 64, 128)
    assert tuple(pal[21]) == (255, 255, 255)
    assert tuple(pal[255]) == (224, 224, 192)


def test_palette_shapes():
    for ds in ['pascal', 'coco', 'ade']:
        assert get_palette(ds).shape == (256, 3)
    assert get_palette('cityscapes').shape == (19, 3)


def test_text_embedding_shapes():
    # Verified shapes of the bundled fp16 assets (SURVEY.md §2.5).
    expect = {
        ('pascal', 'single'): 21,
        ('pascal', 'conceptavg4_single'): 21,
        ('pascal', 'concept4_single'): 98,
        ('cityscapes', 'single'): 19,
        ('cityscapes', 'conceptavg3_single'): 19,
        ('cityscapes', 'concept3_single'): 54,
        ('coco', 'single'): 81,
        ('ade', 'single'): 150,
    }
    for (ds, variant), n in expect.items():
        emb = load_text_embedding(text_embedding_path(ds, variant))
        assert emb.shape == (n, 512), (ds, variant, emb.shape)
        assert emb.dtype == np.float32
        norms = np.linalg.norm(emb, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=2e-2)


def test_concept_flattening():
    concepts, c2cls, cls2c = flatten_class_concepts(VOC12_WBG_CLASSES_W_CONCEPTS4)
    assert len(concepts) == 98
    assert len(cls2c) == 21
    assert cls2c[0][0] == 0 and c2cls[0] == 0
    concepts, _, cls2c = flatten_class_concepts(CITYSCAPES_CLASSES_W_CONCEPTS3)
    assert len(concepts) == 54 and len(cls2c) == 19

    c2c = get_class_to_concept_idxs('voc12_wbg_concept4_single.npy')
    assert sum(len(v) for v in c2c.values()) == 98


def test_split_assets_exist():
    for ds, splits in {
        'pascal': ['92', '183', '366', '732', '1464'],
        'cityscapes': ['1_30', '1_16', '1_8', '1_4', '1_2'],
        'ade': ['1_128', '1_64', '1_32', '1_16', '1_8'],
    }.items():
        assert os.path.isfile(os.path.join(ASSETS, 'splits', ds, 'val.txt'))
        for s in splits:
            p = os.path.join(ASSETS, 'splits', ds, s, 'labeled.txt')
            assert os.path.isfile(p), p
            line = open(p).readline().strip()
            assert len(line.split(' ')) == 2


def test_concept_aggregation_matches_loop(rng):
    import jax.numpy as jnp
    from semivl_tpu.text import aggregate_concept_predictions

    c2c = get_class_to_concept_idxs('voc12_wbg_concept4_single')
    pred = rng.randn(2, 98, 4, 4).astype(np.float32)
    got = np.asarray(aggregate_concept_predictions(jnp.asarray(pred), c2c))
    want = np.zeros((2, 21, 4, 4), np.float32)
    for cls_i, conc_i in c2c.items():
        want[:, cls_i] = pred[:, conc_i].max(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_npy_cache_invalidates_on_overwrite(tmp_path):
    """_load_npy keys its cache on (path, mtime, size): a regenerated file
    at the same path must be re-read (round-4 fix — a path-keyed lru_cache
    silently served seed 0's guidance text to every later seed in
    tools/semi_effect_demo.py)."""
    p = str(tmp_path / 'emb.npy')
    a = np.ones((3, 4), np.float16)
    np.save(p, a)
    first = load_text_embedding(p)
    assert first.shape == (3, 4) and float(first[0, 0]) == 1.0
    # overwrite with different contents; bump mtime past fs granularity
    np.save(p, 2 * a)
    os.utime(p, (os.path.getmtime(p) + 2, os.path.getmtime(p) + 2))
    second = load_text_embedding(p)
    assert float(second[0, 0]) == 2.0
