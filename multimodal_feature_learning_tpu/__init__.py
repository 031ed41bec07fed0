"""multimodal_feature_learning_tpu — a TPU-native dense-video-captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SAGA-DVC/multimodal-feature-learning (PDVC / Deformable-DETR / Sparse-DETR
hybrid with a transformer caption decoder for ActivityNet Captions).

Design stance (TPU-first, not a port):
  * functional core: every model is a pure ``init``/``apply`` pair (flax.linen)
    over static shapes; the full forward — including Hungarian matching and
    greedy caption decoding — runs inside one ``jit``.
  * two-tier op strategy for multi-scale deformable attention: a pure-jnp
    gather oracle (tier 1) and a fused Pallas TPU kernel (tier 2), checked
    against each other in interpret mode.
  * parallelism via ``jax.sharding.Mesh`` + NamedSharding; loss reductions are
    ``psum`` inside the jitted step (no NCCL analog needed).
"""

__version__ = "0.1.0"
