"""Attribute embeddings (reference `sg2im/attribute_embed.py`)."""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp


class AttributeEmbedding(nn.Module):
    """Averaged multi-hot embedding (attribute_embed.py:7-15): x (.., N) are
    multi-hot indicator rows; output is the count-normalized embedding mix."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, x):
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_embeddings, self.embedding_dim))
        emb = x @ table
        return emb / jnp.sum(x, axis=-1, keepdims=True)


class AttributeEmbeddings(nn.Module):
    """One embedding table per attribute, concatenated, with an optional fused
    linear head (attribute_embed.py:18-48).

    attributes: {attr name -> {label -> id}} from the vocab. The fused linear
    is created when there is more than one attribute or when forced, matching
    the reference's `use_attr_fc_gen` switch.
    """

    attributes: Dict[str, Dict[str, int]]
    embedding_dim: int
    use_attr_fc_gen: bool = False

    @nn.compact
    def __call__(self, objs):
        """objs: (B, O, A) int attribute ids -> (B, O, A * embedding_dim)."""
        names = list(self.attributes)
        vecs = []
        for k, name in enumerate(names):
            num = max(self.attributes[name].values()) + 1
            emb = nn.Embed(num, self.embedding_dim, name=f"att_emb_{k}")
            vecs.append(emb(objs[..., k]))
        out = jnp.concatenate(vecs, axis=-1)
        if len(names) > 1 or self.use_attr_fc_gen:
            out = nn.Dense(len(names) * self.embedding_dim,
                           name="attribute_fc_gen")(out)
        return out
