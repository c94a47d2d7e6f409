"""Training state for the SG->Layout stage.

The reference splits the generator's parameters into three optimizer groups:
base params at ``learning_rate``, transitivity logits at 1e-2, and the
converse matrix under its own Adam at 1e-2 updated only by the REINFORCE loss
(`scripts/train.py:314-323`). Because the groups are disjoint,
``optax.multi_transform`` reproduces the exact same update in a single
optimizer state, and the REINFORCE gradient (which only touches the converse
matrix) is simply summed into the main gradient tree before the update.
"""
from __future__ import annotations

from typing import Any, Dict

import flax
import jax
import optax
from flax.training import train_state

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.models.sg2layout import Sg2LayoutModel

CANONICAL_PARAMS = ("trans_candidates_weights", "converse_candidates_weights")


class LayoutTrainState(train_state.TrainState):
    batch_stats: Any = None


def param_labels(params) -> Dict:
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if path[-1] == "trans_candidates_weights":
            labels[path] = "trans"
        elif path[-1] == "converse_candidates_weights":
            labels[path] = "converse"
        else:
            labels[path] = "base"
    return flax.traverse_util.unflatten_dict(labels)


def layout_optimizer(cfg: Config) -> optax.GradientTransformation:
    # torch.optim.Adam defaults (b1=0.9) for the generator groups
    # (train.py:321-323).
    lr_canon = cfg.canonical_learning_rate
    return optax.multi_transform(
        {
            "base": optax.adam(cfg.learning_rate),
            "trans": optax.adam(lr_canon),
            "converse": optax.adam(lr_canon),
        },
        param_labels,
    )


def create_layout_state(cfg: Config, rng) -> LayoutTrainState:
    import jax.numpy as jnp

    model = Sg2LayoutModel(
        vocab=cfg.vocab,
        dtype=jnp.dtype(cfg.compute_dtype),
        embedding_dim=cfg.embedding_dim,
        gconv_dim=cfg.gconv_dim,
        gconv_hidden_dim=cfg.gconv_hidden_dim,
        gconv_num_layers=cfg.gconv_num_layers,
        gconv_pooling=cfg.gconv_pooling,
        mlp_normalization=cfg.mlp_normalization,
        mask_size=cfg.mask_size,
        mask_noise_dim=cfg.mask_noise_dim,
        learned_init=cfg.learned_init,
    )
    import jax.numpy as jnp

    O, T, A = 8, 16, cfg.num_attributes
    objs = jnp.zeros((1, O, A), jnp.int32)
    triplets = jnp.zeros((1, T, 3), jnp.int32)
    ttype = jnp.zeros((1, T), jnp.int32)
    p_rng, n_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "noise": n_rng},
                           objs, triplets, ttype, train=False)
    return LayoutTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=layout_optimizer(cfg),
    )
