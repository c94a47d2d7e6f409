"""canonicalsg2im_tpu — a TPU-native framework for scene-graph-to-image generation.

Re-implements the full capability surface of "Learning Canonical Representations
for Scene Graph to Image Generation" (ECCV 2020, reference: roeiherz/CanonicalSg2Im)
as an idiomatic JAX / XLA / Pallas / pjit stack:

- ``graphs``   — weighted scene-graph canonicalization (WSGC): transitive closure,
                 minimal-equivalent-DAG reduction, learned converse/transitive edge
                 sampling and its REINFORCE probability model.
- ``data``     — host-side datasets (synthetic CLEVR, CLEVR-Dialog, COCO, VG) with
                 fixed-shape bucketed batching for XLA-friendly compilation.
- ``models``   — SG->Layout GCN, AttSPADE generator, multiscale/object/mask
                 discriminators, all in Flax with NHWC layouts for the TPU MXU.
- ``ops``      — differentiable layout splatting and bilinear box cropping as
                 closed-form XLA einsums (plus Pallas kernels for fused paths).
- ``losses``   — GAN (hinge/ls/bce/wgan), feature-matching, perceptual, bbox losses.
- ``train``    — jitted multi-optimizer GAN train step, REINFORCE converse update,
                 checkpointing, the training driver.
- ``parallel`` — device-mesh construction and sharding rules (dp + graph sharding).
- ``evaluation`` — IoU / Inception Score / FID.
"""

__version__ = "0.1.0"
