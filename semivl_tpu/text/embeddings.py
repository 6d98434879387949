"""CLIP text-embedding loading and concept aggregation.

The reference loads the text-embedding ``.npy`` from disk on *every forward
call* (reference model/vlm.py:116); here embeddings are loaded once and kept
as device-resident constants.

Embeddings are precomputed with CLIP ViT-B/16's text encoder over
``"a photo of a {c}"`` prompts and L2-normalised (reference
model/text_embeddings.py:156-186). The bundled ``.npy`` assets are float16 of
shape (num_classes_or_concepts, 512).
"""

import functools
import os

import numpy as np

from semivl_tpu.text import concepts as _concepts

_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), 'assets', 'text_embedding')

# Dataset key -> embedding asset prefix (reference model/builder.py:119-124).
EMB_DATASET_PREFIX = {
    'pascal': 'voc12_wbg',
    'cityscapes': 'cityscapes',
    'coco': 'coco',
    'ade': 'ade',
}


def text_embedding_path(dataset, variant):
    """Path of the bundled text-embedding asset for (dataset, variant).

    An absolute ``.npy`` path passes through unchanged (custom guidance
    embeddings, e.g. tools/semi_effect_demo.py's synthetic-CLIP text)."""
    if os.path.isabs(str(variant)):
        return variant
    prefix = EMB_DATASET_PREFIX[dataset]
    return os.path.join(_ASSET_DIR, f'{prefix}_{variant}.npy')


@functools.lru_cache(maxsize=None)
def _load_npy_versioned(path, mtime_ns, size):
    del mtime_ns, size  # cache-key components only
    return np.load(path)


def _load_npy(path):
    # key the cache on (path, mtime, size): tools that regenerate an
    # embedding file in-process (e.g. per-seed synthetic guidance text in
    # tools/semi_effect_demo.py) must not read a stale cached copy
    st = os.stat(path)
    return _load_npy_versioned(path, st.st_mtime_ns, st.st_size)


def load_text_embedding(path_or_name, dtype=np.float32):
    """Load a text embedding by asset path or bare asset name.

    Returns a float array of shape (N, 512), L2-normalised rows.
    """
    path = path_or_name
    if not os.path.isabs(path) and not os.path.exists(path):
        name = os.path.basename(path_or_name)
        if not name.endswith('.npy'):
            name += '.npy'
        path = os.path.join(_ASSET_DIR, name)
    return _load_npy(path).astype(dtype)


def get_class_to_concept_idxs(path_or_name):
    """Class index -> list of concept row indices for a concept embedding.

    Parity: reference model/text_embeddings.py:208-215 (keyed by .npy path);
    here keyed by the asset base name so absolute paths also resolve.
    """
    name = os.path.basename(str(path_or_name))
    if name.endswith('.npy'):
        name = name[:-len('.npy')]
    if name not in _concepts.CONCEPT_LISTS:
        raise ValueError(f'No concept list known for embedding {name!r}')
    _, _, class_to_concept_idxs = _concepts.flatten_class_concepts(
        _concepts.CONCEPT_LISTS[name])
    return class_to_concept_idxs


def concept_aggregation_matrix(class_to_concept_idxs, num_concepts):
    """(num_classes, num_concepts) bool matrix: M[c, k] = concept k in class c."""
    num_classes = len(class_to_concept_idxs)
    mat = np.zeros((num_classes, num_concepts), dtype=bool)
    for cls_i, conc_idxs in class_to_concept_idxs.items():
        mat[cls_i, conc_idxs] = True
    return mat


def aggregate_concept_predictions(pred, class_to_concept_idxs):
    """Max-aggregate per-concept logits to per-class logits.

    ``pred``: (B, num_concepts, H, W) array (jnp or np). Returns
    (B, num_classes, H, W). Parity: reference model/text_embeddings.py:188-193
    (max over each class's concept logits).

    Implemented as a masked max over a static membership matrix so it lowers
    to a single vectorised reduce on TPU instead of a per-class gather loop.
    """
    import jax.numpy as jnp

    num_concepts = pred.shape[1]
    mask = concept_aggregation_matrix(class_to_concept_idxs, num_concepts)
    # (B, 1, K, H, W) with -inf outside each class's concept set -> max over K.
    neg_inf = jnp.asarray(-jnp.inf, dtype=pred.dtype)
    masked = jnp.where(mask[None, :, :, None, None], pred[:, None], neg_inf)
    return jnp.max(masked, axis=2)
