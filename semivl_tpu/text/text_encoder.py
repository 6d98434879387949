"""CLIP text encoder (Flax) + embedding generation.

Parity: the reference generates its text-embedding ``.npy`` assets offline
with OpenAI CLIP's text encoder (model/text_embeddings.py:156-186,
third_party/zegclip/models/backbones/text_encoder.py): causal-masked text
transformer (width 512, 12 layers, 8 heads, QuickGELU), token + positional
embeddings, ``ln_final``, text projection, EOT-token pooling, L2 norm.

Runtime training only consumes the precomputed .npy (bundled in assets/);
this module exists to regenerate or extend them when a CLIP checkpoint and
the BPE vocab are available (zero-egress environments can't download them).
"""

import gzip
import html
import os
from functools import lru_cache
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from semivl_tpu.models.layers import LayerNorm, Mlp, quick_gelu


class CLIPTextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32. Returns (B, embed_dim) UN-normalised."""
        b, l = tokens.shape
        tok_emb = self.param('token_embedding',
                             nn.initializers.normal(0.02),
                             (self.vocab_size, self.width), jnp.float32)
        pos_emb = self.param('positional_embedding',
                             nn.initializers.normal(0.01),
                             (self.context_length, self.width), jnp.float32)
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None, :l].astype(
            self.dtype)

        causal = jnp.tril(jnp.ones((l, l), bool))
        for i in range(self.layers):
            y = LayerNorm(eps=1e-5, dtype=self.dtype,
                          name=f'layers_{i}_ln1')(x)
            attn = _causal_attention(y, self.heads, causal, self.dtype,
                                     parent=self, name=f'layers_{i}_attn')
            x = x + attn
            y = LayerNorm(eps=1e-5, dtype=self.dtype,
                          name=f'layers_{i}_ln2')(x)
            x = x + Mlp(hidden_dim=4 * self.width, act=quick_gelu,
                        dtype=self.dtype, name=f'layers_{i}_ffn')(y)

        x = LayerNorm(eps=1e-5, dtype=self.dtype, name='ln_final')(x)
        # EOT pooling: feature at the highest token id (the EOT token)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot]
        proj = self.param('text_projection', nn.initializers.normal(0.02),
                          (self.width, self.embed_dim), jnp.float32)
        return pooled @ proj.astype(pooled.dtype)


def _causal_attention(y, heads, mask, dtype, parent, name):
    """Packed-QKV causal attention sharing the Attention param layout."""

    class _Causal(nn.Module):
        @nn.compact
        def __call__(self, y):
            c = y.shape[-1]
            in_proj = nn.Dense(3 * c, name='in_proj', dtype=dtype,
                               param_dtype=jnp.float32)
            out_proj = nn.Dense(c, name='out_proj', dtype=dtype,
                                param_dtype=jnp.float32)
            q, k, v = jnp.split(in_proj(y), 3, axis=-1)
            b, l, _ = q.shape
            d = c // heads

            def split(x):
                return x.reshape(b, l, heads, d).transpose(0, 2, 1, 3)

            logits = jnp.einsum('bhqd,bhkd->bhqk', split(q) * (d ** -0.5),
                                split(k))
            logits = jnp.where(mask[None, None], logits.astype(jnp.float32),
                               -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum('bhqk,bhkd->bhqd', probs, split(v))
            out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
            return out_proj(out)

    return _Causal(name=name, parent=parent)(y)


# ---------------- BPE tokenizer (CLIP's SimpleTokenizer) ----------------

def default_bpe_path():
    return os.environ.get(
        'SEMIVL_CLIP_BPE',
        os.path.join(os.path.dirname(__file__), '..', 'assets',
                     'bpe_simple_vocab_16e6.txt.gz'))


@lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord('!'), ord('~') + 1))
          + list(range(ord('\xa1'), ord('\xac') + 1))
          + list(range(ord('\xae'), ord('\xff') + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class SimpleTokenizer:
    """CLIP BPE tokenizer; needs the public bpe_simple_vocab_16e6.txt.gz."""

    def __init__(self, bpe_path=None):
        import regex as re  # standard `regex` module used by CLIP
        bpe_path = bpe_path or default_bpe_path()
        if not os.path.isfile(bpe_path):
            raise FileNotFoundError(
                f'CLIP BPE vocab not found at {bpe_path}; download '
                'bpe_simple_vocab_16e6.txt.gz from the openai/CLIP repo and '
                'set SEMIVL_CLIP_BPE')
        self.byte_encoder = bytes_to_unicode()
        merges = gzip.open(bpe_path).read().decode('utf-8').split('\n')
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + '</w>' for v in vocab]
        for merge in merges:
            vocab.append(''.join(merge))
        vocab.extend(['<|startoftext|>', '<|endoftext|>'])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {'<|startoftext|>': '<|startoftext|>',
                      '<|endoftext|>': '<|endoftext|>'}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", re.IGNORECASE)

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        pairs = get_pairs(word)
        if not pairs:
            return token + '</w>'
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(
                p, float('inf')))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = ' '.join(word)
        self.cache[token] = out
        return out

    def encode(self, text):
        import regex as re
        bpe_tokens = []
        text = html.unescape(html.unescape(text)).strip().lower()
        text = re.sub(r'\s+', ' ', text)
        for token in re.findall(self.pat, text):
            token = ''.join(self.byte_encoder[b]
                            for b in token.encode('utf-8'))
            bpe_tokens.extend(self.encoder[t]
                              for t in self.bpe(token).split(' '))
        return bpe_tokens

    def tokenize(self, texts, context_length=77):
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder['<|startoftext|>']
        eot = self.encoder['<|endoftext|>']
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [sot] + self.encode(text) + [eot]
            assert len(toks) <= context_length, text
            result[i, :len(toks)] = toks
        return result


def generate_text_embeddings(class_names, text_params, tokenizer=None,
                             template='a photo of a {}'):
    """Encode prompts -> L2-normalised (N, 512) embeddings (reference
    model/text_embeddings.py:156-162)."""
    tokenizer = tokenizer or SimpleTokenizer()
    tokens = tokenizer.tokenize([template.format(c) for c in class_names])
    model = CLIPTextTransformer()
    emb = model.apply({'params': text_params}, jnp.asarray(tokens))
    emb = np.asarray(emb)
    return emb / np.linalg.norm(emb, axis=-1, keepdims=True)
