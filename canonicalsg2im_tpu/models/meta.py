"""Meta model composition (reference `sg2im/meta_models.py`).

``MetaGeneratorModel`` composes the SG->Layout GCN with the AttSPADE
generator; either stage can be skipped, matching ``--skip_graph_model`` /
``--skip_generation``. The reference wraps each stage in
DataParallelWithCallback (meta_models.py:17-23); here parallelism is a
property of how the train step is jitted over the mesh, not of the model.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.models.sg2layout import Sg2LayoutModel
from canonicalsg2im_tpu.models.spade import SPADEGenerator


class MetaGeneratorModel(nn.Module):
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
    ngf: int = 64
    image_size: tuple = (256, 256)
    num_upsampling_layers: str = "normal"
    norm_G: str = "spectralspadesyncbatch3x3"
    aspect_ratio: float = 1.0
    use_vae: bool = False
    z_dim: int = 256
    skip_graph_model: bool = False
    skip_generation: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = True
    remat_spade_mlp: bool = False
    use_pallas_splat: bool = False
    use_pallas_splat_eval: bool = False
    fused_spade_eval: bool = False

    @classmethod
    def from_config(cls, cfg: Config) -> "MetaGeneratorModel":
        return cls(
            vocab=cfg.vocab, embedding_dim=cfg.embedding_dim,
            gconv_dim=cfg.gconv_dim, gconv_hidden_dim=cfg.gconv_hidden_dim,
            gconv_num_layers=cfg.gconv_num_layers,
            gconv_pooling=cfg.gconv_pooling,
            mlp_normalization=cfg.mlp_normalization, mask_size=cfg.mask_size,
            mask_noise_dim=cfg.mask_noise_dim, learned_init=cfg.learned_init,
            ngf=cfg.ngf, image_size=tuple(cfg.image_size),
            num_upsampling_layers=cfg.num_upsampling_layers, norm_G=cfg.norm_G,
            aspect_ratio=cfg.aspect_ratio, use_vae=cfg.use_vae, z_dim=cfg.z_dim,
            skip_graph_model=cfg.skip_graph_model,
            skip_generation=cfg.skip_generation,
            dtype=jnp.dtype(cfg.compute_dtype),
            use_pallas_splat=cfg.use_pallas_splat,
            use_pallas_splat_eval=bool(cfg.use_pallas_splat_eval),
            fused_spade_eval=bool(cfg.fused_spade_eval),
            remat=cfg.remat_generator,
            remat_spade_mlp=cfg.remat_spade_mlp,
        )

    @nn.compact
    def __call__(self, objs, triplets, triplet_type, boxes_gt=None,
                 masks_gt=None, *, test_mode: bool = False, train: bool = True):
        """Returns (img, boxes_pred, masks_pred) — meta_models.py:25-51.

        Whether GT boxes/masks are supplied is a static (trace-time) choice,
        exactly like the reference's `boxes_gt is None` branching.
        """
        boxes_pred = None
        masks_pred = None
        if not self.skip_graph_model:
            _, boxes_pred, masks_pred = Sg2LayoutModel(
                vocab=self.vocab, embedding_dim=self.embedding_dim,
                gconv_dim=self.gconv_dim,
                gconv_hidden_dim=self.gconv_hidden_dim,
                gconv_num_layers=self.gconv_num_layers,
                gconv_pooling=self.gconv_pooling,
                mlp_normalization=self.mlp_normalization,
                mask_size=self.mask_size, mask_noise_dim=self.mask_noise_dim,
                learned_init=self.learned_init,
                dtype=self.dtype,
                name="sg_to_layout",
            )(objs, triplets, triplet_type, train=train)

        img = None
        if not self.skip_generation:
            layout_boxes = boxes_pred if boxes_gt is None else boxes_gt
            layout_masks = masks_pred if masks_gt is None else masks_gt
            img = SPADEGenerator(
                vocab=self.vocab, embedding_dim=self.embedding_dim,
                ngf=self.ngf, image_size=self.image_size,
                num_upsampling_layers=self.num_upsampling_layers,
                norm_G=self.norm_G, aspect_ratio=self.aspect_ratio,
                use_vae=self.use_vae, z_dim=self.z_dim,
                dtype=self.dtype, remat=self.remat,
                remat_spade_mlp=self.remat_spade_mlp,
                use_pallas_splat=self.use_pallas_splat,
                use_pallas_splat_eval=self.use_pallas_splat_eval,
                fused_spade_eval=self.fused_spade_eval,
                name="layout_to_image_model",
            )(objs, layout_boxes, layout_masks, test_mode=test_mode,
              train=train)
        return img, boxes_pred, masks_pred
