"""Distributed CLIP + autoregressive pretraining.

TPU-native replacement for the reference DDP loop
(coati/training/train_coati.py:60-439):

  * one process per HOST (not per chip); the `data` mesh covers all
    devices, multi-host via jax.distributed.initialize;
  * the train step is SPMD over the mesh with the CLIP loss spanning the
    GLOBAL batch — by default through pjit sharding propagation, or
    explicitly via shard_map + `lax.all_gather` (replacing the custom
    differentiable NCCL all_gather, autograd_funs.py:5-25 — JAX AD emits
    the reduce-scatter backward automatically) with `lax.pmean` gradient
    averaging (replacing DDP allreduce); see make_train_step;
  * optax AdamW (betas 0.9/0.99, eps 1e-8, wd 0.1) + global-norm clip,
    cosine-annealed per epoch, matching train_coati.py:145-152, 276;
  * loss = ar_loss + clip_loss * log2(vocab) (train_coati.py:87, 267-272);
  * checkpoints are model documents with the reference envelope
    (train_args / model_kwargs / offline_loss / token counters).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from coati_tpu.models import coati as F
from coati_tpu.models.coati import CoatiConfig, CoatiParams, init_coati
from coati_tpu.models.io import params_to_state, serialize_model
from coati_tpu.parallel.mesh import make_mesh, shard_batch
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer
from coati_tpu.training.config import TrainConfig
from coati_tpu.training.flops import coati_train_step_model_flops
from coati_tpu.training.logger import COATILogger


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.clip_grad),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=config.lr,
            b1=0.9,
            b2=0.99,
            eps=1e-8,
            weight_decay=config.weight_decay,
        ),
    )


def cosine_lr(config: TrainConfig, epoch: int) -> float:
    """torch CosineAnnealingLR(T_max=n_epochs, eta_min=0) stepped per epoch."""
    return 0.5 * config.lr * (1.0 + np.cos(np.pi * epoch / config.n_epochs))


def set_learning_rate(opt_state, lr: float):
    """Non-mutating update of the injected learning rate (the optimizer is
    optax.chain(clip, inject_hyperparams(adamw)))."""
    inject_state = opt_state[1]
    hp = dict(inject_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return (opt_state[0], inject_state._replace(hyperparams=hp)) + tuple(
        opt_state[2:]
    )


def model_config_from_train_config(config: TrainConfig, n_tok: int) -> CoatiConfig:
    return CoatiConfig(
        n_layer_e3gnn=config.n_layer_e3gnn,
        n_layer_xformer=config.n_layer_xformer,
        n_hidden_xformer=config.n_hidden_xformer,
        n_hidden_e3nn=config.n_hidden_e3nn,
        msg_cutoff_e3nn=config.msg_cutoff_e3nn,
        n_embd_common=config.n_embd_common,
        n_head=config.n_head,
        n_seq=config.max_n_seq,
        n_tok=n_tok,
        biases=config.biases,
        torch_emb=config.torch_emb,
        norm_clips=config.norm_clips,
        norm_embed=config.norm_embed,
        token_mlp=config.token_mlp,
        use_point_encoder=config.do_clip,
        dtype=config.dtype,
        egnn_remat=config.egnn_remat,
        remat=config.xformer_remat,
        softmax_dtype=config.softmax_dtype,
        # never auto-select the flash prefill kernel under
        # differentiation: its custom VJP replays the XLA forward, so
        # fwd+grad through it is strictly slower (flash_attention.py);
        # TrainConfig's default n_seq=200 would otherwise trip "auto"
        prefill_kernel="xla",
    )


class DeferredMetrics:
    """One-step-deferred metric reads for the epoch loops.

    float(metrics[...]) blocks on the device; draining step i's metrics
    only after batch i+1's host xform + transfer are done lets that
    host work run under the device step (JAX async dispatch) —
    measured 1.33x end-to-end on the real pipeline (PERF.md). Values
    are unchanged, just read one step later. Drain BEFORE dispatching
    step i+1: at most one execution stays in flight (this runtime
    intermittently penalizes a 2-deep dispatch queue — the
    drain-after-dispatch form measured 0.87x in one session).
    TRAIN_SYNC_METRICS=1 restores the per-step sync (push() then
    drains immediately; call push() inside the step timer so sync-mode
    timings match the pre-pipelining behavior for A/Bs).
    """

    def __init__(self, process):
        self._process = process  # (step_idx, metrics, batch_size) -> None
        self._pending = None
        self.sync = os.environ.get("TRAIN_SYNC_METRICS") == "1"

    def drain(self):
        if self._pending is not None:
            pending, self._pending = self._pending, None
            self._process(*pending)

    def push(self, step_idx, metrics, batch_size):
        self._pending = (step_idx, metrics, batch_size)
        if self.sync:
            self.drain()


def make_epoch_metrics_processor(
    *,
    config,
    logger,
    offline_losses,
    partition: str,
    epoch: int,
    is_main: bool,
    totals: dict,
    get_counters,
    clip_metric: str = "clip_loss",
    clip_label: str = "clip_l",
    log_clip: bool = True,
    loss_arr=None,
):
    """Build the (step_idx, metrics, batch_size) processor both epoch
    loops hand to DeferredMetrics: reads the three scalar losses,
    appends the JSONL offline-loss records, prints the periodic line,
    and accumulates totals["loss"]/["count"]. `get_counters` returns the
    loop's live (n_toks, ng, t0) for the log tags/rates; `loss_arr`
    (COATI1) enables the 10-step loss smoothing in the printout."""

    def process(j, metrics, bsz):
        loss = float(metrics["loss"])
        ar = float(metrics["ar_loss"])
        cl = float(metrics["clip_loss"])
        if is_main:
            n_toks, ng, t0 = get_counters()
            if logger is not None and j % config.log_batch_loss == 0:
                tags = {"n_toks": n_toks}
                offline_losses["batch_losses"].append(
                    logger.log_metric(
                        f"{partition}_batch_loss", loss,
                        dataset_epoch=epoch, step=j, tags=tags,
                    )
                )
                offline_losses["ar_losses"].append(
                    logger.log_metric(
                        f"{partition}_ar_loss", ar,
                        dataset_epoch=epoch, step=j, tags=tags,
                    )
                )
                if log_clip:
                    offline_losses["clip_losses"].append(
                        logger.log_metric(
                            f"{partition}_{clip_metric}", cl,
                            dataset_epoch=epoch, step=j, tags=tags,
                        )
                    )
            if j % config.log_interval == 0:
                prefix = "" if partition == "train" else f">> {partition} \t"
                recent = (loss_arr[-10:] if loss_arr else None) or [loss]
                print(
                    prefix
                    + f"Epoch {epoch} \t it {j} \t toks {n_toks // 10**6}m "
                    f"\t ar_l: {ar:.2f}, {clip_label} {cl:.6f}, "
                    f"loss {sum(recent) / len(recent):.4f} \t "
                    f"grads_ps {ng / max(time.time() - t0, 1e-6):.4f}"
                )
        totals["loss"] += loss * bsz
        totals["count"] += bsz
        if loss_arr is not None:
            loss_arr.append(loss)

    return process


def tpu_compiler_options():
    """TPU-only XLA overrides for the train-step jit: raise the scoped-
    VMEM ceiling to the EGNN kernels' design budget (64 MB,
    ops/pallas/egnn_messages.py:50). On this toolchain's remote AOT
    compile path the per-call pltpu.CompilerParams(vmem_limit_bytes=
    64M) does NOT shield the kernel from the GLOBAL scoped ceiling:
    at the synth corpus's 96-atom bucket the fused-backward's chosen
    grid tile needs ~36.5 MB of scoped VMEM and the compile dies with
    an XLA INTERNAL ("Scoped allocation ... exceeded scoped vmem
    limit", reported at whatever the global limit is — measured at the
    16 MB default and at 12/32 MB overrides; compile-only A/B in
    /tmp/repro_compile.py form). Raising the GLOBAL limit to >= the
    kernel's demand fixes it: 40 MB and 64 MB both compile, with
    memory-space assignment left on. 64 MB matches the budget the
    kernel's tile picker already assumes (_VMEM_BUDGET = 56 MB + Mosaic
    scratch headroom) so every molecule bucket's tiling fits. CPU/GPU
    backends reject the flag, hence the gate; returns None (jit
    default) off-TPU."""
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return {"xla_tpu_scoped_vmem_limit_kib": 65536}
    except Exception:  # noqa: BLE001 - no backend yet / query failure
        pass
    return None


def make_train_step(
    mesh,
    model_cfg: CoatiConfig,
    optimizer: optax.GradientTransformation,
    *,
    stop_token: int,
    unk_token: int,
    p_clip_emb_smi: float,
    token_entropy_unit: float,
    do_clip: bool,
    axis: str = "data",
    is_training: bool = True,
    mode: str = "pjit",
):
    """Build the jitted SPMD train step:
    (params, opt_state, rng, batch) -> (params, opt_state, metrics).

    mode="pjit" (default): one global jit; the batch arrives sharded on
    the `axis` mesh dimension and XLA's SPMD partitioner inserts the
    collectives — the CLIP logits matrix s @ c.T globalizes the
    contrastive batch automatically, and gradient reduction falls out of
    the replicated-parameter sharding. Fewer moving parts and the fastest
    path on every runtime we've measured.

    mode="shard_map": the explicit per-shard formulation mirroring the
    reference's comm pattern 1:1 — local forward, `lax.all_gather` of
    embeddings for the global CLIP loss (autograd_funs.py:5-25), and
    `lax.pmean` gradient averaging (DDP allreduce). Semantically
    equivalent; kept for pedagogy and for runtimes where explicit
    collectives schedule better. NOTE: per-shard AR loss is averaged per
    shard then pmean'd (exact DDP semantics), while pjit averages over
    global valid tokens — identical when shards carry equal token counts.
    """

    def local_loss(params, rng, batch):
        h_e3gnn, h_smiles, logits, bad_rows = F.forward(
            params,
            model_cfg,
            rng,
            batch["raw_tokens"],
            batch["tokens"],
            batch["atoms"],
            batch["coords"],
            stop_token,
            unk_token,
            p_clip_emb_smi,
        )
        ar = F.ar_loss_fn(logits, batch["y_next"])
        if do_clip:
            # global contrastive batch over the mesh (ICI collectives)
            all_hs = jax.lax.all_gather(h_smiles, axis, axis=0, tiled=True)
            all_he = jax.lax.all_gather(h_e3gnn, axis, axis=0, tiled=True)
            all_bad = jax.lax.all_gather(bad_rows, axis, axis=0, tiled=True)
            cl = F.clip_loss(all_hs, all_he, all_bad)
            loss = ar + cl * token_entropy_unit
        else:
            cl = jnp.zeros(())
            loss = ar
        return loss, (ar, cl)

    def shard_step(params, opt_state, rng, batch):
        # decorrelate the per-shard clip-token choice like per-rank torch
        # RNG in the reference
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if is_training:
            (loss, (ar, cl)), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, rng, batch)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        else:
            loss, (ar, cl) = local_loss(params, rng, batch)
        metrics = jax.lax.pmean(
            {"loss": loss, "ar_loss": ar, "clip_loss": cl}, axis
        )
        return params, opt_state, metrics

    def global_step(params, opt_state, rng, batch):
        """pjit formulation: ops see GLOBAL (sharded) arrays."""

        def global_loss(params):
            h_e3gnn, h_smiles, logits, bad_rows = F.forward(
                params,
                model_cfg,
                rng,
                batch["raw_tokens"],
                batch["tokens"],
                batch["atoms"],
                batch["coords"],
                stop_token,
                unk_token,
                p_clip_emb_smi,
            )
            ar = F.ar_loss_fn(logits, batch["y_next"])
            if do_clip:
                cl = F.clip_loss(h_smiles, h_e3gnn, bad_rows)
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

    # donate params/opt_state only when they are actually replaced;
    # the eval step returns its inputs untouched and callers keep them
    donate = (0, 1) if is_training else ()

    if mode == "pjit":
        return jax.jit(global_step, donate_argnums=donate,
                       compiler_options=tpu_compiler_options())

    batch_spec = {
        "raw_tokens": P(axis),
        "tokens": P(axis),
        "y_next": P(axis),
        "atoms": P(axis),
        "coords": P(axis),
    }
    stepped = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(stepped, donate_argnums=donate,
                   compiler_options=tpu_compiler_options())


def train_autoencoder(
    config: TrainConfig,
    dataset,
    mesh=None,
    logger: Optional[COATILogger] = None,
    max_steps_per_epoch: Optional[int] = None,
) -> Tuple[CoatiParams, dict]:
    """Full pretraining loop (reference train_autoencoder,
    train_coati.py:60-439). `dataset` must expose get_data_pipe(...)
    (COATI_dataset or compatible)."""
    is_main = jax.process_index() == 0
    mesh = mesh or make_mesh()
    n_shards = mesh.devices.size

    if is_main and logger is not None:
        # self-describing run dir (reference writes params.json at start,
        # train_coati.py:79-82)
        import json

        from coati_tpu.common.util import makedir

        run_dir = os.path.join(config.output_dir, config.exp_name, config.run_name)
        makedir(run_dir)
        with open(os.path.join(run_dir, "params.json"), "w") as f:
            json.dump(config.as_dict(), f)
    tokenizer = TrieTokenizer(
        n_seq=config.n_seq, **get_vocab(config.tokenizer_vocab)
    )
    token_entropy_unit = float(np.log(tokenizer.n_token) / np.log(2.0))

    model_cfg = model_config_from_train_config(config, tokenizer.n_token)
    model_kwargs = {
        "n_layer_xformer": config.n_layer_xformer,
        "n_layer_e3gnn": config.n_layer_e3gnn,
        "n_hidden_e3nn": config.n_hidden_e3nn,
        "n_hidden_xformer": config.n_hidden_xformer,
        "n_embd_common": config.n_embd_common,
        "biases": config.biases,
        "n_head": config.n_head,
        "n_seq": config.max_n_seq,
        "n_tok": tokenizer.n_token,
        "torch_emb": config.torch_emb,
        "norm_clips": config.norm_clips,
        "norm_embed": config.norm_embed,
        "token_mlp": config.token_mlp,
        "use_point_encoder": config.do_clip,
    }

    params = init_coati(jax.random.PRNGKey(0), model_cfg)
    optimizer = make_optimizer(config)
    n_toks = 0
    ngrad_updates = 0
    offline_losses = {"batch_losses": [], "ar_losses": [], "clip_losses": []}

    if config.resume_document is not None:
        from coati_tpu.models.io import load_model_doc, params_from_state
        from coati_tpu.models.convert import convert_coati, strip_module_prefix

        doc = load_model_doc(config.resume_document)
        n_toks = doc.get("n_toks_processed", 0)
        ngrad_updates = doc.get("n_grads_processed", 0)
        sd = strip_module_prefix(doc["model"])
        # reference state_dicts are flat with dotted keys; ours are nested
        if any("." in k for k in sd):
            loaded = convert_coati(sd, model_cfg)
        else:
            loaded = params_from_state(model_cfg, sd)
        if config.load_transformer_only:
            params = params.replace(
                xformer=loaded.xformer, smiles_to_clip=loaded.smiles_to_clip
            )
        else:
            params = loaded
        print("Loaded from checkpoint. ")

    # Parameter placement policy (parallel/placement.py): "auto" = DP
    # replication or Megatron TP on a `model` axis; "fsdp" = ZeRO-3
    # param+moment sharding over the data axis.
    from coati_tpu.parallel.placement import resolve_placement

    place_params, commit_opt = resolve_placement(
        mesh, config.param_sharding, config.parallel_mode
    )
    params = place_params(mesh, params)
    opt_state = optimizer.init(params)
    start_epoch = 0
    global_step = 0

    if config.resume_document is not None and config.resume_optimizer:
        try:
            saved_opt = load_model_doc(config.resume_document).get("optimizer")
            if saved_opt is not None:
                # commit the HOST arrays straight onto the mesh so
                # TP/FSDP moment shardings apply during the transfer —
                # an asarray here would materialize the full fp32
                # moments on one device first, the exact memory spike
                # FSDP exists to avoid
                opt_state = commit_opt(mesh, saved_opt, opt_state)
        except Exception as ex:  # noqa: BLE001 - mirror reference tolerance
            print("failed to resume optimizer", ex)

    ckpt_mgr = None
    if config.orbax_dir:
        from coati_tpu.training.checkpoints import HAS_ORBAX, CheckpointManager

        if HAS_ORBAX:
            ckpt_mgr = CheckpointManager(config.orbax_dir)
            restored = ckpt_mgr.restore_latest(
                {
                    "params": params,
                    "opt_state": opt_state,
                    "counters": np.zeros((4,), np.int64),
                }
            )
            if restored is not None:
                # re-commit onto the mesh: the template's freshly-init'd
                # opt_state scalars carry single-device placements
                params = place_params(mesh, restored["params"])
                opt_state = commit_opt(mesh, restored["opt_state"], opt_state)
                n_toks, ngrad_updates, start_epoch, global_step = (
                    int(x) for x in restored["counters"]
                )
                print(
                    f"Resumed from orbax step {ckpt_mgr.latest_step()} "
                    f"(epoch {start_epoch})"
                )
        else:
            print("orbax_dir set but orbax-checkpoint unavailable; skipping")

    step_train = make_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tokenizer.stop_token,
        unk_token=tokenizer.unk_token,
        p_clip_emb_smi=config.p_clip_emb_smi,
        token_entropy_unit=token_entropy_unit,
        do_clip=config.do_clip,
        is_training=True,
        mode=config.parallel_mode,
    )
    step_eval = make_train_step(
        mesh, model_cfg, optimizer,
        stop_token=tokenizer.stop_token,
        unk_token=tokenizer.unk_token,
        p_clip_emb_smi=config.p_clip_emb_smi,
        token_entropy_unit=token_entropy_unit,
        do_clip=config.do_clip,
        is_training=False,
        mode=config.parallel_mode,
    )

    from coati_tpu.data.xform import clip_ar_xform

    def xform_routine(batch):
        return clip_ar_xform(
            batch,
            tokenizer=tokenizer,
            p_dataset=config.p_dataset,
            p_formula=config.p_formula,
            p_fim=config.p_fim,
            p_graph=config.p_graph,
            p_clip=config.p_clip,
            p_clip_cut=config.p_clip_cut,
            p_randsmiles=config.p_randsmiles,
        )

    rng = jax.random.PRNGKey(1)
    results = {"epochs": [], "losses": [], "best_test": 1e10, "best_epoch": 0,
               "best_params": None}

    def checkpoint(tags):
        nonlocal ngrad_updates
        blob = serialize_model(
            train_args=config.as_dict(),
            dataset_summary=getattr(dataset, "summary", {}),
            model_state=params_to_state(params),
            model_kwargs=model_kwargs,
            optimizer_state=jax.tree_util.tree_map(
                np.asarray, jax.device_get(opt_state)
            ),
            n_toks_processed=n_toks,
            n_grads_processed=ngrad_updates,
            offline_loss=offline_losses,
        )
        if logger is not None:
            logger.log_model_document(blob, tags=tags)

    def orbax_checkpoint(epoch: int):
        """Orbax save — a COLLECTIVE in multi-host runs (orbax syncs all
        processes), so this must be called by EVERY process, unlike the
        rank-0 document write above."""
        if ckpt_mgr is not None:
            ckpt_mgr.save(
                global_step,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "counters": np.asarray(
                        [n_toks, ngrad_updates, epoch, global_step], np.int64
                    ),
                },
            )

    def do_epoch(epoch: int, partition: str) -> Optional[float]:
        nonlocal rng, params, opt_state, n_toks, ngrad_updates, global_step
        from coati_tpu.training.diagnostics import step_timer

        timer = step_timer()
        t0 = time.time()
        loss_arr, ng = [], 0
        total_model_flops = 0.0  # analytic fwd+bwd FLOPs (training/flops.py)
        # global batch = per-device batch * n_shards, matching the
        # reference's per-GPU batch semantics
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
            log_clip=config.do_clip, loss_arr=loss_arr,
        )

        dm = DeferredMetrics(process_metrics)
        for i, batch in enumerate(pipe):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            if batch["tokens"].shape[0] != batch["atoms"].shape[0]:
                print("a row was lost, skipping batch")
                continue
            host_batch = {
                k: batch[k]
                for k in ("raw_tokens", "tokens", "y_next", "atoms", "coords")
            }
            if mesh.devices.size == 1:
                # plain transfer, NOT NamedSharding-committed: on the
                # axon-tunneled runtime a mesh-committed input makes the
                # SPMD executable pathologically slow — measured 4433 vs
                # 127 ms/step on the same grande step, same data, one
                # device (A/B/C in PERF.md "single-device input
                # commitment"); sharding a 1-device mesh adds nothing
                # semantically, so feed uncommitted arrays there
                device_batch = jax.device_put(host_batch)
            else:
                device_batch = shard_batch(mesh, host_batch)
            rng, step_rng = jax.random.split(rng)
            bsz = batch["tokens"].shape[0]
            if (
                partition == "train"
                and config.lr_warmup_steps
                and global_step < config.lr_warmup_steps
            ):
                # linear per-step LR warmup (off by default — the
                # reference recipe has none). At init the InfoNCE
                # embeddings sit near a collapsed saddle (deep residual
                # towers map everything to almost one direction); a
                # full-lr first step overshoots INTO the saddle, where
                # the clip gradient is ~0 and escape is erratic.
                # Measured on grande 16x256: step-0 gnorm 31 -> loss
                # pinned at ln(B) with gnorm 0.05 for ~75 steps.
                opt_state = set_learning_rate(
                    opt_state,
                    cosine_lr(config, epoch)
                    * (global_step + 1) / config.lr_warmup_steps,
                )
            if partition == "train":
                total_model_flops += coati_train_step_model_flops(
                    n_layer_xformer=config.n_layer_xformer,
                    n_hidden_xformer=config.n_hidden_xformer,
                    n_layer_e3gnn=config.n_layer_e3gnn,
                    n_hidden_e3nn=config.n_hidden_e3nn,
                    n_tok=tokenizer.n_token,
                    batch=bsz,
                    seq=batch["tokens"].shape[1],
                    natoms=batch["atoms"].shape[1],
                )
            with timer:
                if not dm.sync:
                    # drain the PREVIOUS step only now — its device
                    # execution overlapped this batch's host xform and
                    # transfer — and BEFORE dispatching the next step,
                    # keeping at most one execution in flight (this
                    # runtime slows down with a 2-deep dispatch queue;
                    # drain-after-dispatch measured 0.87x, PERF.md)
                    dm.drain()
                if partition == "train":
                    params, opt_state, metrics = step_train(
                        params, opt_state, step_rng, device_batch
                    )
                    global_step += 1
                else:
                    _, _, metrics = step_eval(
                        params, opt_state, step_rng, device_batch
                    )
                if dm.sync:
                    # A/B knob: per-step sync INSIDE the timer, exactly
                    # the pre-pipelining behavior
                    dm.push(i, metrics, bsz)
            if not dm.sync:
                dm.push(i, metrics, bsz)
            # counters advance on EVERY process (deterministic from the
            # shared input stream) so the checkpoint cadence fires in
            # lockstep — the orbax save is a multi-host collective
            if partition == "train":
                ngrad_updates += bsz
                ng += bsz
                n_toks += int((batch["tokens"] > 0).sum())
                if ngrad_updates > config.ngrad_to_save:
                    ngrad_updates = 0
                    if is_main:
                        checkpoint(
                            {"train_epoch": str(epoch), "dataset_epoch": str(epoch)}
                        )
                    orbax_checkpoint(epoch)
        dm.drain()
        if totals["count"] == 0:
            return None
        if is_main:
            print(f"epoch completed in {ng} grads and {time.time() - t0} seconds")
            if logger is not None:
                logger.log_metric(
                    f"{partition} epoch mean loss", totals["loss"] / totals["count"],
                    dataset_epoch=epoch,
                )
                stats = timer.emit()
                if partition == "train" and total_model_flops:
                    # observability: achieved model-FLOPs throughput per
                    # chip over the epoch wall (incl. host/checkpoint
                    # time); compare against the device's measured
                    # matmul ceiling for an MFU estimate (PERF.md)
                    stats["model_tflops_per_sec_per_chip"] = (
                        total_model_flops
                        / max(time.time() - t0, 1e-9)
                        / n_shards
                        / 1e12
                    )
                logger.log_metrics(
                    {f"{partition}_{k}": v for k, v in stats.items()},
                    dataset_epoch=epoch,
                )
        return totals["loss"] / totals["count"]

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
                results["best_params"] = jax.device_get(params)
            print(f"test loss: {test_loss:.4f} \t epoch {epoch}")
            print(
                f"Best: test loss: {results['best_test']:.4f} \t "
                f"epoch {results['best_epoch']}"
            )

    if is_main:
        checkpoint({"best": "best"})
    orbax_checkpoint(config.n_epochs)
    if ckpt_mgr is not None:
        ckpt_mgr.wait()
        ckpt_mgr.close()
    return params, results
