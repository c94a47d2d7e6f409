"""SG -> Layout model (reference `sg2im/model.py:18-124`).

Attribute embeddings -> predicate embeddings -> N x GraphTripleConv ->
box-regression MLP (+ optional deconv mask head). The learned canonicalization
parameters (per-predicate transitivity logits and the P x P converse weight
matrix) live here as flax params, exactly as the reference stores them on the
model (model.py:32-33); the training loop reads the converse matrix back to
the host each step to drive the data pipeline's edge sampling.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from canonicalsg2im_tpu.models.embed import AttributeEmbeddings
from canonicalsg2im_tpu.models.gcn import GraphTripleConv
from canonicalsg2im_tpu.models.layers import MLP, upsample_nearest


def canonical_weight_init(learned_init: str):
    """get_predicates_weights (sg2im/graph.py:115-127)."""
    if learned_init == "uniform":
        return lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    if learned_init in ("0", "-4", "4"):
        val = float(learned_init)
        return lambda key, shape: jnp.full(shape, val, dtype=jnp.float32)
    raise ValueError(learned_init)


def symmetrize_converse(weights):
    """triu + triu.T symmetrization (get_conv_converse, sg2im/model.py:8-15)."""
    triu = jnp.triu(weights)
    return triu + triu.T


class MaskNet(nn.Module):
    """Upsample->conv->BN->relu stack to a power-of-two mask size, final 1x1
    conv (reference _build_mask_net, model.py:67-79)."""

    dim: int
    mask_size: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        size = 1
        if self.mask_size & (self.mask_size - 1):
            raise ValueError("Mask size must be a power of 2")
        while size < self.mask_size:
            x = upsample_nearest(x, 2)
            x = nn.Conv(self.dim, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
            x = nn.relu(x)
            size *= 2
        return nn.Conv(1, (1, 1))(x)


class Sg2LayoutModel(nn.Module):
    vocab: Dict
    embedding_dim: int = 32
    gconv_dim: int = 128
    gconv_hidden_dim: int = 512
    gconv_num_layers: int = 5
    gconv_pooling: str = "avg"
    mlp_normalization: str = "none"
    mask_size: int = 0
    mask_noise_dim: int = 64
    learned_init: str = "uniform"
    dtype: jnp.dtype = jnp.float32  # GCN MLP compute dtype; box head stays f32

    @nn.compact
    def __call__(self, objs, triplets, triplet_type, *, train: bool = True):
        """
        Args:
          objs: (B, O, A) attribute ids
          triplets: (B, T, 3) [s, p, o]
          triplet_type: (B, T) edge tags
        Returns:
          (obj_vecs (B, O, gconv_dim), boxes_pred (B, O, 4),
           masks_pred (B, O, M, M) or None)
        """
        num_preds = len(self.vocab["pred_idx_to_name"])
        pad_idx = self.vocab["pred_name_to_idx"]["__padding__"]
        init = canonical_weight_init(self.learned_init)
        trans_weights = self.param("trans_candidates_weights", init, (num_preds,))
        # consumed by the host data pipeline + REINFORCE loss; declared here so
        # it checkpoints with the model, as in the reference (model.py:33)
        self.param("converse_candidates_weights", init, (num_preds, num_preds))

        s, p, o = triplets[..., 0], triplets[..., 1], triplets[..., 2]
        edges = jnp.stack([s, o], axis=-1)
        pred_mask = p != pad_idx

        obj_vecs = AttributeEmbeddings(self.vocab["attributes"],
                                       self.embedding_dim,
                                       name="attribute_embedding")(objs)
        pred_vecs = nn.Embed(num_preds, self.embedding_dim,
                             name="pred_embeddings")(p)

        for i in range(self.gconv_num_layers):
            obj_vecs, pred_vecs = GraphTripleConv(
                hidden_dim=self.gconv_hidden_dim,
                object_output_dim=self.gconv_dim,
                predicate_output_dim=self.gconv_dim,
                mlp_normalization=self.mlp_normalization,
                pooling=self.gconv_pooling,
                dtype=self.dtype,
                name=f"gconv_{i}",
            )(obj_vecs, pred_vecs, edges, pred_mask, triplet_type, p,
              trans_weights, train=train)

        boxes_pred = MLP((self.gconv_hidden_dim, 4),
                         batch_norm=self.mlp_normalization,
                         final_nonlinearity=None, name="box_net")(
            obj_vecs, train=train)

        masks_pred = None
        if self.mask_size > 0:
            B, O, D = obj_vecs.shape
            # the reference draws ONE noise vector shared by every object of
            # every sample (model.py:81-88)
            noise = jax.random.normal(self.make_rng("noise"),
                                      (1, 1, self.mask_noise_dim))
            mask_vecs = jnp.concatenate(
                [obj_vecs, jnp.broadcast_to(noise, (B, O, self.mask_noise_dim))],
                axis=-1)
            x = mask_vecs.reshape(B * O, 1, 1, D + self.mask_noise_dim)
            scores = MaskNet(D + self.mask_noise_dim, self.mask_size,
                             name="mask_net")(x, train=train)
            masks_pred = nn.sigmoid(
                scores.reshape(B, O, self.mask_size, self.mask_size))
        return obj_vecs, boxes_pred, masks_pred
