"""CLIP text-encoder tests (module contract; tokenizer gated on vocab)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semivl_tpu.text.text_encoder import (
    CLIPTextTransformer,
    SimpleTokenizer,
    bytes_to_unicode,
    default_bpe_path,
)


@pytest.mark.slow
def test_text_transformer_shapes(rng):
    m = CLIPTextTransformer(vocab_size=100, context_length=16, width=32,
                            layers=2, heads=4, embed_dim=24)
    tokens = np.zeros((2, 16), np.int32)
    tokens[0, :3] = [1, 5, 99]   # eot = argmax = 99 at position 2
    tokens[1, :2] = [1, 99]
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    out = m.apply(variables, jnp.asarray(tokens))
    assert out.shape == (2, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_causality(rng):
    """Changing tokens after the EOT position must not affect the output."""
    m = CLIPTextTransformer(vocab_size=100, context_length=16, width=32,
                            layers=2, heads=4, embed_dim=24)
    t1 = np.zeros((1, 16), np.int32)
    t1[0, :3] = [1, 5, 99]
    t2 = t1.copy()
    t2[0, 10] = 7  # after the pooled position
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(t1))
    o1 = m.apply(variables, jnp.asarray(t1))
    o2 = m.apply(variables, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_bytes_to_unicode_bijection():
    mapping = bytes_to_unicode()
    assert len(mapping) == 256
    assert len(set(mapping.values())) == 256


@pytest.mark.skipif(not os.path.isfile(default_bpe_path()),
                    reason='CLIP BPE vocab not bundled (zero-egress env)')
def test_tokenizer_roundtrip():
    tok = SimpleTokenizer()
    out = tok.tokenize('a photo of a dog')
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.encoder['<|startoftext|>']


def test_tokenizer_missing_vocab_errors(tmp_path, monkeypatch):
    monkeypatch.setenv('SEMIVL_CLIP_BPE', str(tmp_path / 'missing.gz'))
    with pytest.raises(FileNotFoundError):
        SimpleTokenizer()
