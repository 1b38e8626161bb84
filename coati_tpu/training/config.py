"""Training configuration.

Dataclass with the same field names as the reference argparse schema
(coati/training/train_coati.py:442-580) so params.json files and
checkpoint train_args round-trip. DDP topology flags are replaced by the
JAX mesh (world size = number of devices; multi-host via
jax.distributed.initialize)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class TrainConfig:
    exp_name: str = "token_transformer"
    run_name: str = ""
    output_dir: str = "COATI_outputs"
    model_dir: str = "COATI_models"
    data_dir: str = "COATI_data"

    dtype: str = "float32"  # compute dtype ("float32" | "bfloat16")
    log_batch_loss: int = 25
    n_epochs: int = 2
    batch_size: int = 32  # per-device batch size (reference: per-GPU)

    recipe: List[dict] = field(
        default_factory=lambda: [
            {"collection": "geom_drugs", "n_samples": 6_000_000, "filter": {}}
        ]
    )

    n_layer_e3gnn: int = 4
    n_hidden_e3nn: int = 128
    msg_cutoff_e3nn: float = 10.0
    n_hidden_xformer: int = 128
    n_embd_common: int = 128
    n_layer_xformer: int = 16
    n_head: int = 8
    biases: bool = True
    n_seq: int = 200  # max length during training
    max_n_seq: int = 250  # max length the model can forward
    tokenizer_vocab: str = "mar"
    torch_emb: bool = False
    load_transformer_only: bool = False

    p_dataset: float = 0.3
    p_formula: float = 0.3
    p_fim: float = 0.5
    p_graph: float = 0.3
    p_clip: float = 0.3
    p_clip_cut: float = 0.3
    p_clip_emb_smi: float = 0.4
    p_randsmiles: float = 0.5

    norm_clips: bool = False
    token_mlp: bool = False
    norm_embed: bool = False
    # EGNN backward rematerialization. True is the safe default (bounds
    # the dense-path (B,N,N,H) peak); grande turns it off for +12%
    # step throughput — the fused Pallas message kernel never
    # materializes that tensor and the bf16 residuals fit (PERF.md).
    egnn_remat: bool = True
    # transformer-trunk backward rematerialization: the scan backward
    # otherwise stores per-layer attention probs; remat is -23% trunk
    # fwd+grad at grande scale (PERF.md), so grande turns it ON
    xformer_remat: bool = False
    # training-attention softmax dtype: "float32" (parity) | "compute"
    # (bf16 probs end-to-end, -16% trunk fwd+grad; PERF.md)
    softmax_dtype: str = "float32"
    weight_decay: float = 0.1
    lr: float = 4e-4
    clip_grad: float = 10.0
    # linear per-step LR warmup over this many steps (0 = off, the
    # reference recipe: torch CosineAnnealingLR has no warmup,
    # train_coati.py:152). Used by the small-corpus eval recipes, where
    # a full-lr first step overshoots the InfoNCE init saddle (see
    # train.py warmup comment).
    lr_warmup_steps: int = 0
    do_clip: bool = True

    test_frac: float = 0.02
    valid_frac: float = 0.02
    test_interval: int = 1
    log_interval: int = 100
    ngrad_to_save: float = 2e6

    resume_document: Optional[str] = None
    resume_optimizer: bool = False
    # orbax restart-from-latest (SURVEY §5.3: the reference has no elastic
    # recovery; async checkpoints + restart replace it). When set, every
    # checkpoint also lands in this directory and training resumes from
    # the latest one automatically.
    orbax_dir: Optional[str] = None

    # distributed step formulation: "pjit" (SPMD sharding propagation) or
    # "shard_map" (explicit all_gather + pmean); see training/train.py
    parallel_mode: str = "pjit"
    # parameter placement: "auto" (replicate on DP meshes, Megatron TP on
    # a model axis — parallel/tp.py) or "fsdp" (ZeRO-3-style sharding of
    # params + Adam moments over the data axis — parallel/fsdp.py;
    # requires parallel_mode="pjit")
    param_sharding: str = "auto"

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def grande_config(**overrides) -> TrainConfig:
    """The 'grande' pretraining recipe
    (examples/training/train_grande.py:13-70)."""
    cfg = TrainConfig(
        test_frac=0.02,
        valid_frac=0.0,
        n_layer_e3gnn=5,
        n_hidden_e3nn=256,
        msg_cutoff_e3nn=12.0,
        n_hidden_xformer=256,
        n_embd_common=256,
        n_layer_xformer=16,
        n_head=16,
        max_n_seq=250,
        n_seq=80,
        biases=True,
        torch_emb=False,
        norm_clips=True,
        norm_embed=False,
        token_mlp=True,
        tokenizer_vocab="mar",
        p_dataset=0.2,
        p_formula=0.0,
        p_fim=0.0,
        p_graph=0.0,
        p_clip=0.9,
        p_clip_emb_smi=0.5,
        p_randsmiles=0.3,
        batch_size=160,
        lr=5.0e-4,
        weight_decay=0.1,
        n_epochs=25,
        clip_grad=10.0,
        test_interval=2,
        ngrad_to_save=2e6,
        egnn_remat=False,  # +12% step throughput, see PERF.md
        xformer_remat=True,  # -23% trunk fwd+grad, see PERF.md
        softmax_dtype="compute",  # bf16 attention probs, see PERF.md
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
