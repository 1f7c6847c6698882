"""TPU-native vision-transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
PyTorch reference `neeresh/vision-transformers`:

- ``models.image_classification``: ViT, CPE-ViT, CPVT, CPVT-GAP, DeiT (with
  knowledge distillation), PVT, Swin, T2T-ViT, TNT, Twins-SVT.
- ``models.object_detection``: DETR (backbone + encoder-decoder transformer +
  Hungarian matcher + set criterion + COCO eval) — completed where the
  reference is unfinished.
- ``ops``: the TPU compute path — Pallas flash attention (full / windowed /
  spatial-reduction), fused GELU-MLP, patch embedding as an MXU matmul,
  Performer feature maps — each with a pure-jnp twin used as test oracle and
  CPU fallback.
- ``parallel``: mesh construction and sharding rules (dp/tp) over ICI via
  ``jax.sharding`` + jit, multi-host init.
- ``training``: one shared jitted trainer replacing the reference's eight
  copy-pasted train loops.
- ``utils``: args registry, data pipelines (CIFAR/ImageNet/COCO), losses,
  metrics, checkpointing, visualization.
- ``serving``: AOT export (``jax.export`` StableHLO artifacts, static batch
  buckets) + request micro-batching — the deployment path.
"""

__version__ = "0.1.0"
