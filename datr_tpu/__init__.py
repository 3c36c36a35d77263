"""datr_tpu: a TPU-native (JAX/XLA/Pallas) domain-adaptive detection-transformer framework.

From-scratch rebuild of the capabilities of DATR (h751410234/DATR, IEEE TIP 2025):
a DINO-style deformable detection transformer with unsupervised domain adaptation
(GRL image discriminator, prototype adversarial + contrastive alignment) and a
two-stage teacher-student self-training pipeline — redesigned for TPU:

- multi-scale deformable attention as a Pallas kernel (reference CUDA ext:
  models/dino/ops/src/cuda/ms_deform_attn_cuda.cu)
- static-shape everything (padded canvases, capped targets, static CDN layout)
- pure-functional model/criterion/train-step under jit
- mesh-sharded data/model parallelism via jax.sharding instead of DDP/NCCL
"""

__version__ = "0.1.0"
