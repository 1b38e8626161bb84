"""coati_tpu — a TPU-native (JAX / XLA / Pallas) rebuild of COATI.

COATI is a multi-modal contrastive encoder/decoder of druglike chemical
space: a causal rotary SMILES transformer and an E(3)-equivariant point-cloud
encoder trained jointly with a CLIP-style InfoNCE loss plus an autoregressive
loss with the molecule's own embedding injected as a soft token
(reference: coati/models/encoding/clip_e2e.py).

This package is a ground-up TPU-first re-design, not a port:
  * compute path is pure JAX (jit / shard_map / Pallas), static shapes,
    stacked-layer `lax.scan` transformers, KV-cache fused decoding;
  * distributed training uses `jax.sharding.Mesh` + collectives over ICI
    instead of NCCL DDP;
  * host-side chemistry (RDKit) and tokenization are quarantined in
    `coati_tpu.chem` / `coati_tpu.tokenizers` and feed fixed-shape device
    batches.
"""

__version__ = "0.1.0"
