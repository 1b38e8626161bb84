"""COATI2 pretraining: directCLR + property-conditioned AR (BEYOND-PARITY).

The reference ships COATI2 as inference only (coati/models/simple_coati2/;
README.md:23-25 describes the model but no training code is public). This
module provides a complete TPU-native training recipe reconstructed from
the published artifacts:

  * loss = ar_loss + directCLR(h_canonical, h_permuted) * log2(vocab) —
    mirroring the COATI1 loss composition (train_coati.py:87,267-272) with
    the 3D-contrastive term replaced by a 2D-only directCLR objective over
    the first `n_direct_clr` embedding dims (the slice width the inference
    config carries, transformer_only.py:56; Jing et al. arXiv:2110.09348);
  * data rows from coati2_ar_xform (data/xform_coati2.py): property-token
    conditioning blocks drawn from the coati2_12_12 vocabulary, [CLIP][UNK]
    injection prefixes, permuted second views;
  * the same SPMD step formulations as the COATI1 trainer (training/
    train.py): pjit (default) or shard_map with explicit lax.all_gather of
    both views for the global contrastive batch;
  * checkpoints are COATI2 model documents loadable by
    coati_tpu.models.io.load_coati2, plus optional orbax restart-from-latest.

Conditioning efficacy is validated end-to-end by
scripts/eval_coati2_conditioning.py: a model trained with this stack
steers generated molecule size EXACTLY to the conditioning token
(correlation 1.000 across [NUM5/8/11/14] targets). Requirement learned
there: keep p_clip < 1 — rows that train WITHOUT the [CLIP][UNK]
embedding injection are what force the model to actually use the
property tokens (with the embedding present they are redundant).
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from coati_tpu.models.coati2 import (
    Coati2Config,
    Coati2Params,
    coati2_training_forward,
    direct_clr_loss,
    init_coati2,
)
from coati_tpu.models.coati import ar_loss_fn
from coati_tpu.models.io import params_to_state, serialize_model
from coati_tpu.parallel.mesh import make_mesh, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.logger import COATILogger
from coati_tpu.training.train import (
    DeferredMetrics,
    cosine_lr,
    make_epoch_metrics_processor,
    make_optimizer,
    set_learning_rate,
)


@dataclass
class Coati2TrainConfig:
    exp_name: str = "coati2"
    run_name: str = ""
    output_dir: str = "COATI_outputs"

    dtype: str = "float32"
    n_epochs: int = 2
    batch_size: int = 32  # per-device

    # model (COATI2 grande: 512-d embedding, SwiGLU heads, README.md:23)
    n_layer_xformer: int = 16
    n_hidden_xformer: int = 256
    embed_dim: int = 256
    n_head: int = 16
    n_seq: int = 128
    enc_to_coati: str = "swiglu_resnet"
    n_direct_clr: int = 64
    biases: bool = True
    tokenizer_vocab: str = "coati2_12_12"

    # data recipe (coati2_ar_xform)
    p_props: float = 0.5
    p_prop_each: float = 0.5
    p_clip: float = 0.9
    p_dataset: float = 0.2

    # objective
    clr_inv_temp: float = 10.0
    do_clr: bool = True
    remat: bool = True  # activation rematerialization in the backward
    # training-attention softmax dtype: "compute" = softmax in the
    # compute dtype (a no-op under f32; under bf16 it keeps the probs
    # tensor and its backward residual in bf16, -16% trunk fwd+grad,
    # PERF.md). The COATI2 recipe is ours (the reference ships inference
    # only), so the fast path is the default; set "float32" to force
    # exact softmax.
    softmax_dtype: str = "compute"

    # optimizer (reference COATI1 values, train_coati.py:145-152)
    lr: float = 4e-4
    weight_decay: float = 0.1
    clip_grad: float = 10.0

    log_batch_loss: int = 25
    log_interval: int = 100
    test_interval: int = 1
    ngrad_to_save: float = 2e6
    resume_document: Optional[str] = None
    orbax_dir: Optional[str] = None
    parallel_mode: str = "pjit"
    # "auto" (replicate / Megatron TP on a model axis) or "fsdp"
    # (ZeRO-3 param+moment sharding — the COATI2-grande fp32 moments are
    # exactly the memory FSDP targets); see parallel/placement.py
    param_sharding: str = "auto"

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)

    def model_config(self, n_tok: int) -> Coati2Config:
        return Coati2Config(
            n_layer_xformer=self.n_layer_xformer,
            n_hidden_xformer=self.n_hidden_xformer,
            embed_dim=self.embed_dim,
            n_head=self.n_head,
            n_seq=self.n_seq,
            enc_to_coati=self.enc_to_coati,
            n_direct_clr=self.n_direct_clr,
            n_tok=n_tok,
            biases=self.biases,
            dtype=self.dtype,
            remat=self.remat,
            softmax_dtype=self.softmax_dtype,
            # never auto-select the flash prefill kernel under
            # differentiation: its custom VJP replays the XLA forward,
            # so fwd+grad through it is strictly slower (flash_attention.py)
            prefill_kernel="xla",
        )

    def model_kwargs(self, n_tok: int) -> dict:
        """Document model_kwargs, matching load_coati2's expected fields
        (models/convert.py _COATI2_KWARG_FIELDS)."""
        return {
            "n_layer_xformer": self.n_layer_xformer,
            "n_hidden_xformer": self.n_hidden_xformer,
            "embed_dim": self.embed_dim,
            "n_head": self.n_head,
            "n_seq": self.n_seq,
            "enc_to_coati": self.enc_to_coati,
            "n_direct_clr": self.n_direct_clr,
            "n_tok": n_tok,
            "biases": self.biases,
        }


def make_coati2_train_step(
    mesh,
    model_cfg: Coati2Config,
    optimizer: optax.GradientTransformation,
    *,
    stop_token: int,
    unk_token: int,
    pad_token: int = 0,
    token_entropy_unit: float,
    do_clr: bool = True,
    clr_inv_temp: float = 10.0,
    axis: str = "data",
    is_training: bool = True,
    mode: str = "pjit",
):
    """(params, opt_state, rng, batch) -> (params, opt_state, metrics).

    Same two formulations as the COATI1 step (training/train.py:94-226):
    pjit lets XLA's SPMD partitioner globalize the directCLR logits;
    shard_map all-gathers both views explicitly."""

    def loss_parts(params, batch):
        h1, h2, logits, bad_rows = coati2_training_forward(
            params,
            model_cfg,
            batch["tokens"],
            batch["raw_tokens"],
            batch["rand_tokens"],
            stop_token,
            unk_token,
            pad_token,
        )
        ar = ar_loss_fn(logits, batch["y_next"])
        return h1, h2, bad_rows, ar

    def shard_step(params, opt_state, rng, batch):
        del rng  # the recipe has no device-side stochastic choice

        def local_loss(params):
            h1, h2, bad_rows, ar = loss_parts(params, batch)
            if do_clr:
                all_h1 = jax.lax.all_gather(h1, axis, axis=0, tiled=True)
                all_h2 = jax.lax.all_gather(h2, axis, axis=0, tiled=True)
                all_bad = jax.lax.all_gather(bad_rows, axis, axis=0, tiled=True)
                cl = direct_clr_loss(
                    all_h1, all_h2, all_bad, model_cfg.n_direct_clr, clr_inv_temp
                )
                return ar + cl * token_entropy_unit, (ar, cl)
            return ar, (ar, jnp.zeros(()))

        if is_training:
            (loss, (ar, cl)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        else:
            loss, (ar, cl) = local_loss(params)
        metrics = jax.lax.pmean(
            {"loss": loss, "ar_loss": ar, "clip_loss": cl}, axis
        )
        return params, opt_state, metrics

    def global_step(params, opt_state, rng, batch):
        del rng

        def global_loss(params):
            h1, h2, bad_rows, ar = loss_parts(params, batch)
            if do_clr:
                cl = direct_clr_loss(
                    h1, h2, bad_rows, model_cfg.n_direct_clr, clr_inv_temp
                )
                return ar + cl * token_entropy_unit, (ar, cl)
            return ar, (ar, jnp.zeros(()))

        if is_training:
            (loss, (ar, cl)), grads = jax.value_and_grad(
                global_loss, has_aux=True
            )(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            opt_state = new_opt
        else:
            loss, (ar, cl) = global_loss(params)
        return params, opt_state, {"loss": loss, "ar_loss": ar, "clip_loss": cl}

    donate = (0, 1) if is_training else ()
    if mode == "pjit":
        return jax.jit(global_step, donate_argnums=donate)

    batch_spec = {
        "tokens": P(axis),
        "raw_tokens": P(axis),
        "rand_tokens": P(axis),
        "y_next": P(axis),
    }
    stepped = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(stepped, donate_argnums=donate)


def train_coati2(
    config: Coati2TrainConfig,
    dataset,
    mesh=None,
    logger: Optional[COATILogger] = None,
    max_steps_per_epoch: Optional[int] = None,
) -> Tuple[Coati2Params, dict]:
    """COATI2 pretraining loop. `dataset` exposes get_data_pipe(...) like
    COATI_dataset; rows need only a 'smiles' column (plus optional
    precomputed 'properties' / 'rand_smiles' / flag columns)."""
    is_main = jax.process_index() == 0
    mesh = mesh or make_mesh()
    n_shards = mesh.devices.size

    tokenizer = TrieTokenizer(
        n_seq=config.n_seq, **get_vocab(config.tokenizer_vocab)
    )
    token_entropy_unit = float(np.log2(tokenizer.n_token))
    model_cfg = config.model_config(tokenizer.n_token)
    model_kwargs = config.model_kwargs(tokenizer.n_token)

    from coati_tpu.training.config import TrainConfig

    params = init_coati2(jax.random.PRNGKey(0), model_cfg)
    optimizer = make_optimizer(
        TrainConfig(
            lr=config.lr,
            weight_decay=config.weight_decay,
            clip_grad=config.clip_grad,
        )
    )
    n_toks = 0
    ngrad_updates = 0
    start_epoch = 0
    global_step = 0
    offline_losses = {"batch_losses": [], "ar_losses": [], "clip_losses": []}

    if config.resume_document is not None:
        from coati_tpu.models.convert import convert_coati2, strip_module_prefix
        from coati_tpu.models.io import coati2_params_from_state, load_model_doc

        doc = load_model_doc(config.resume_document)
        n_toks = doc.get("n_toks_processed", 0)
        sd = strip_module_prefix(doc["model"])
        if any("." in k for k in sd):
            params = convert_coati2(sd, model_cfg)
        else:
            params = coati2_params_from_state(model_cfg, sd)
        print("Loaded from checkpoint. ")

    from coati_tpu.parallel.placement import resolve_placement

    place_params, commit_opt = resolve_placement(
        mesh, config.param_sharding, config.parallel_mode
    )
    params = place_params(mesh, params)
    opt_state = optimizer.init(params)

    ckpt_mgr = None
    if config.orbax_dir:
        from coati_tpu.training.checkpoints import HAS_ORBAX, CheckpointManager

        if HAS_ORBAX:
            ckpt_mgr = CheckpointManager(config.orbax_dir)
            template = {
                "params": params,
                "opt_state": opt_state,
                "counters": np.zeros((3,), np.int64),
            }
            restored = ckpt_mgr.restore_latest(template)
            if restored is not None:
                # re-commit onto the mesh: the template's freshly-init'd
                # opt_state scalars carry single-device placements
                params = place_params(mesh, restored["params"])
                opt_state = commit_opt(mesh, restored["opt_state"], opt_state)
                n_toks, start_epoch, global_step = (
                    int(x) for x in restored["counters"]
                )
                print(
                    f"Resumed from orbax step {ckpt_mgr.latest_step()} "
                    f"(epoch {start_epoch})"
                )

    step_train = make_coati2_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tokenizer.stop_token,
        unk_token=tokenizer.unk_token,
        pad_token=tokenizer.pad_token,
        token_entropy_unit=token_entropy_unit,
        do_clr=config.do_clr,
        clr_inv_temp=config.clr_inv_temp,
        is_training=True,
        mode=config.parallel_mode,
    )
    step_eval = make_coati2_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tokenizer.stop_token,
        unk_token=tokenizer.unk_token,
        pad_token=tokenizer.pad_token,
        token_entropy_unit=token_entropy_unit,
        do_clr=config.do_clr,
        clr_inv_temp=config.clr_inv_temp,
        is_training=False,
        mode=config.parallel_mode,
    )

    from coati_tpu.data.xform_coati2 import coati2_ar_xform

    def xform_routine(batch):
        return coati2_ar_xform(
            batch,
            tokenizer=tokenizer,
            p_props=config.p_props,
            p_prop_each=config.p_prop_each,
            p_clip=config.p_clip,
            p_dataset=config.p_dataset,
        )

    rng = jax.random.PRNGKey(1)
    results = {"epochs": [], "losses": [], "best_test": 1e10, "best_epoch": 0}

    def checkpoint(tags):
        blob = serialize_model(
            train_args=config.as_dict(),
            dataset_summary=getattr(dataset, "summary", {}),
            model_state=params_to_state(params),
            model_kwargs=model_kwargs,
            optimizer_state=None,
            n_toks_processed=n_toks,
            n_grads_processed=ngrad_updates,
            offline_loss=offline_losses,
        )
        if logger is not None:
            logger.log_model_document(blob, tags=tags)

    def orbax_checkpoint(epoch: int):
        """COLLECTIVE in multi-host runs — call on EVERY process."""
        if ckpt_mgr is not None:
            ckpt_mgr.save(
                global_step,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "counters": np.asarray(
                        [n_toks, epoch, global_step], np.int64
                    ),
                },
            )

    def do_epoch(epoch: int, partition: str) -> Optional[float]:
        nonlocal rng, params, opt_state, n_toks, ngrad_updates, global_step
        t0 = time.time()
        ng = 0
        pipe = dataset.get_data_pipe(
            batch_size=config.batch_size * n_shards,
            partition=partition,
            required_fields=["smiles"],
            xform_routine=xform_routine,
        )
        totals = {"loss": 0.0, "count": 0}
        process_metrics = make_epoch_metrics_processor(
            config=config, logger=logger, offline_losses=offline_losses,
            partition=partition, epoch=epoch, is_main=is_main,
            totals=totals,
            get_counters=lambda: (n_toks, ng, t0),
            clip_metric="clr_loss", clip_label="clr_l",
        )

        dm = DeferredMetrics(process_metrics)
        for i, batch in enumerate(pipe):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            device_batch = shard_batch(
                mesh,
                {k: batch[k] for k in ("tokens", "raw_tokens", "rand_tokens", "y_next")},
            )
            rng, step_rng = jax.random.split(rng)
            bsz = batch["tokens"].shape[0]
            if not dm.sync:
                # drain the PREVIOUS step (its execution overlapped
                # this batch's host work) BEFORE dispatching the next —
                # at most one execution in flight (see train.py)
                dm.drain()
            if partition == "train":
                params, opt_state, metrics = step_train(
                    params, opt_state, step_rng, device_batch
                )
                global_step += 1
            else:
                _, _, metrics = step_eval(params, opt_state, step_rng, device_batch)
            dm.push(i, metrics, bsz)
            # counters advance on every process so the orbax-collective
            # cadence fires in lockstep across hosts
            if partition == "train":
                ngrad_updates += bsz
                ng += bsz
                n_toks += int((batch["tokens"] != tokenizer.pad_token).sum())
                if ngrad_updates > config.ngrad_to_save:
                    ngrad_updates = 0
                    if is_main:
                        checkpoint({"train_epoch": str(epoch)})
                    orbax_checkpoint(epoch)
        dm.drain()
        return totals["loss"] / totals["count"] if totals["count"] else None

    for epoch in range(start_epoch, config.n_epochs):
        opt_state = set_learning_rate(opt_state, cosine_lr(config, epoch))
        do_epoch(epoch, "train")
        if epoch % config.test_interval == 0 and epoch > 0:
            # EVERY process must run the eval epoch — step_eval is a
            # mesh-wide SPMD program, so gating it on is_main would
            # leave processes 1..N out of the collectives and deadlock
            # multi-host runs; only rank 0 records/logs the result.
            test_loss = do_epoch(epoch, "test")
            if test_loss is None or not is_main:
                continue
            results["epochs"].append(epoch)
            results["losses"].append(test_loss)
            if test_loss < results["best_test"]:
                results["best_test"] = test_loss
                results["best_epoch"] = epoch
            print(f"test loss: {test_loss:.4f} \t epoch {epoch}")

    if is_main:
        checkpoint({"best": "best"})
    orbax_checkpoint(config.n_epochs)
    if ckpt_mgr is not None:
        ckpt_mgr.wait()
        ckpt_mgr.close()
    return params, results
