"""HTTP inference server over a COATI / COATI2 model.

BEYOND-PARITY: the reference has no serving story (models are driven
from notebooks in-process). This serves the two production workloads —
SMILES -> embedding and embedding -> SMILES — behind micro-batching
(batcher.py) so concurrent callers share device programs. stdlib-only
(ThreadingHTTPServer + JSON): no framework dependency to gate.

Endpoints (all JSON):
  GET  /healthz                  -> {"status": "ok", "model": ..., "device": ...}
  POST /embed    {"smiles": [...]}
      -> {"embeddings": [[...], ...]}   (invalid rows embed as-is; the
                                         tokenizer raises -> 400 with detail)
  POST /generate {"embeddings": [[...]], "k": 100, "inv_temp": 2.0,
                  "noise_scale": 0.0, "top_p": null}
      -> {"smiles": [...]}
  POST /analogs  {"smiles": [...], "noise_scale": 0.3, "n_analogs": 4,
                  "k": 100, "inv_temp": 2.0}
      -> {"analogs": [[...n_analogs per input...], ...]}  (embed ->
         noisy decode round trip, the tutorial.ipynb workflow as a service)

Generation parameters are part of the batch key: requests only batch
together when (k, inv_temp) agree, since they are shared knobs of one
device program. noise_scale is applied host-side per request, so every
noise level shares programs and co-batches.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from coati_tpu.serving.batcher import MicroBatcher


class _ModelFrontend:
    """Model-type dispatch: COATI (models/api.py) or COATI2
    (models/coati2.py) behind one embed/generate surface."""

    def __init__(self, model, tokenizer):
        self.model = model
        self.tokenizer = tokenizer
        self.is_coati2 = hasattr(model, "hcoati_to_2d_batch")
        self.embed_dim = model.embed_dim

    def tokenize(self, smiles: str) -> np.ndarray:
        """Host-side tokenization, done PER REQUEST (not in the batch
        worker) so a malformed/oversized SMILES 400s its own request
        instead of poisoning co-batched ones."""
        return np.asarray(
            self.tokenizer.tokenize_text("[SMILES]" + smiles + "[STOP]", pad=True),
            np.int32,
        )

    def embed_rows(self, token_rows):
        tokens = np.stack(token_rows)
        return np.asarray(
            self.model.encode_tokens(tokens, self.tokenizer), np.float32
        )

    def generate(self, h, k, inv_temp, noise_scale, top_p=None):
        h = np.asarray(h, np.float32)
        if self.is_coati2:
            return self.model.hcoati_to_2d_batch(
                h, self.tokenizer, noise_scale=noise_scale,
                inv_temp=inv_temp, k=k, top_p=top_p,
            )
        return self.model.hclip_to_2d_batch(
            h, self.tokenizer, noise_scale=noise_scale,
            inv_temp=inv_temp, k=k, top_p=top_p,
        )


class CoatiInferenceServer:
    """Micro-batched HTTP server. Usage:

        server = CoatiInferenceServer(model, tokenizer, port=8000)
        server.start()          # returns immediately (daemon threads)
        ...
        server.stop()

    port=0 picks a free port (server.port after start()).
    """

    def __init__(
        self,
        model,
        tokenizer,
        host: str = "127.0.0.1",
        port: int = 0,
        max_batch: int = 256,
        flush_ms: float = 20.0,
        mesh=None,
        continuous: bool = False,
        n_slots: int = 64,
    ):
        """mesh: optional jax.sharding.Mesh — wraps the model in
        ShardedCOATI / ShardedCOATI2 (parallel/inference.py) so request
        batches split over the `data` axis (multi-chip serving for both
        model families).

        continuous: serve /generate through ContinuousDecoder slot
        pools (n_slots rows per (k, inv_temp) config) instead of
        drain-the-cohort micro-batches — a finished molecule returns at
        the next segment boundary instead of waiting for the longest
        co-batched one (docs/SERVING.md "Continuous batching").
        Both model families (COATI1 via clip_to_special_token, COATI2
        via coati_to_token — the flagship published family,
        reference simple_coati2/transformer_only.py:43); top_p=None
        requests only, others fall back to the micro-batcher."""
        self._continuous = continuous
        # round 5: continuous + mesh shards the slot pool over the data
        # axis (ContinuousDecoder(mesh=...)); previously rejected
        self._mesh = mesh if (mesh is not None and mesh.devices.size > 1) \
            else None
        self._n_slots = n_slots
        if mesh is not None and mesh.devices.size > 1:
            from coati_tpu.parallel.inference import ShardedCOATI, ShardedCOATI2

            wrap = (
                ShardedCOATI2
                if hasattr(model, "hcoati_to_2d_batch")
                else ShardedCOATI
            )
            model = wrap(model, mesh)
        self.frontend = _ModelFrontend(model, tokenizer)
        self.host = host
        self.port = port
        self._embed_batcher = MicroBatcher(
            self.frontend.embed_rows, max_batch=max_batch, flush_ms=flush_ms,
            name="embed-batcher",
        )
        self._noise = np.random.default_rng(0)
        self._noise_lock = threading.Lock()
        # one batcher per (k, inv_temp) tuple (program constants)
        self._gen_batchers: dict = {}
        self._gen_lock = threading.Lock()
        self._max_batch = max_batch
        self._flush_ms = flush_ms
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # distinct (k, inv_temp) tuples each own a batcher + device program;
    # bound them so hostile/misbehaving clients cannot grow threads and
    # compile caches without limit
    MAX_GEN_PROGRAMS = 32

    def _gen_batcher(self, k: int, inv_temp: float, top_p=None):
        # noise is applied host-side per request (op_generate), so it is
        # deliberately NOT part of the program/batcher key — every noise
        # level shares one device program and co-batches. top_p IS part
        # of the key (it is a compiled constant of the sampler program).
        key = (int(k), float(inv_temp), None if top_p is None else float(top_p))
        with self._gen_lock:
            if key not in self._gen_batchers:
                if len(self._gen_batchers) >= self.MAX_GEN_PROGRAMS:
                    raise ValueError(
                        f"too many distinct (k, inv_temp, top_p) configs "
                        f"(> {self.MAX_GEN_PROGRAMS}); reuse existing ones"
                    )
                fe = self.frontend
                if (
                    self._continuous
                    and top_p is None
                    and hasattr(fe.model, "params")
                ):
                    self._gen_batchers[key] = self._make_continuous(
                        int(k), float(inv_temp)
                    )
                else:

                    def gen_fn(rows, _key=key):
                        kk, it, tp = _key
                        return fe.generate(
                            np.stack(rows), kk, it, 0.0, top_p=tp
                        )

                    self._gen_batchers[key] = MicroBatcher(
                        gen_fn, max_batch=self._max_batch,
                        flush_ms=self._flush_ms, name=f"gen-batcher{key}",
                    )
            return self._gen_batchers[key]

    def _make_continuous(self, k: int, inv_temp: float):
        """A ContinuousService slot pool for one (k, inv_temp) config
        (see docs/SERVING.md 'Continuous batching'). Both families ride
        the SAME engine — their decode surfaces are structurally
        identical ([CLIP][UNK][SMILES] prefix, injection over [UNK]);
        only the embedding->token map differs: clip_to_special_token
        (COATI1, models/coati.py) vs the coati_to_token SwiGLU resnet
        (COATI2, models/coati2.py:241 ⇐ reference
        simple_coati2/transformer_only.py:43)."""
        from coati_tpu.ops.layers import cast_floats
        from coati_tpu.serving.continuous import (
            ContinuousDecoder,
            ContinuousService,
        )

        model = self.frontend.model
        tok = self.frontend.tokenizer
        xcfg = model.config.xformer_config
        prefix = list(tok.tokenize_text("[CLIP][UNK][SMILES]", pad=False))
        cparams = cast_floats(model.params, xcfg.compute_dtype)

        if self.frontend.is_coati2:
            from coati_tpu.models.coati2 import apply_swiglu_resnet

            def inj_transform(h):
                return apply_swiglu_resnet(
                    cparams.coati_to_token,
                    h.astype(xcfg.compute_dtype),
                    xcfg.mm_precision,
                )
        else:
            from coati_tpu.models.coati import clip_to_special_token

            def inj_transform(h):
                return clip_to_special_token(
                    cparams, h.astype(xcfg.compute_dtype)
                )

        engine = ContinuousDecoder(
            model.params.xformer, xcfg, prefix,
            n_slots=self._n_slots,
            stop_token=tok.stop_token, pad_token=tok.pad_token,
            inject_token=tok.unk_token, k=k, inv_temp=inv_temp,
            inj_transform=inj_transform, inj_dim=model.embed_dim,
            mesh=self._mesh,
        )
        engine.warmup()  # admission-size first-hits would stall traffic

        def decode_fn(tokens):
            return tok.decode(list(tokens[len(prefix):]), special=False)

        return ContinuousService(
            engine, decode_fn, name=f"continuous-{k}-{inv_temp}"
        )

    # ------------------------------------------------------- request ops

    def op_embed(self, body: dict) -> dict:
        rows = [self.frontend.tokenize(s) for s in body["smiles"]]  # may 400
        futs = [self._embed_batcher.submit(r) for r in rows]
        return {"embeddings": [f.result().tolist() for f in futs]}

    def op_generate(self, body: dict) -> dict:
        h = np.asarray(body["embeddings"], np.float32)
        if h.ndim != 2 or h.shape[1] != self.frontend.embed_dim:
            raise ValueError(
                f"embeddings must be (n, {self.frontend.embed_dim})"
            )
        noise_scale = float(body.get("noise_scale", 0.0))
        if noise_scale > 0:
            # handler threads share this Generator (not thread-safe)
            with self._noise_lock:
                noise = self._noise.normal(scale=noise_scale, size=h.shape)
            h = h + noise.astype(np.float32)
        batcher = self._gen_batcher(
            body.get("k", 100), body.get("inv_temp", 2.0), body.get("top_p")
        )
        futs = [batcher.submit(row) for row in h]
        return {"smiles": [f.result() for f in futs]}

    def op_analogs(self, body: dict) -> dict:
        smiles = body["smiles"]
        n_analogs = int(body.get("n_analogs", 4))
        emb = self.op_embed({"smiles": smiles})["embeddings"]
        h = np.repeat(np.asarray(emb, np.float32), n_analogs, axis=0)
        out = self.op_generate(
            {
                "embeddings": h.tolist(),
                "k": body.get("k", 100),
                "inv_temp": body.get("inv_temp", 2.0),
                "noise_scale": body.get("noise_scale", 0.3),
                "top_p": body.get("top_p"),
            }
        )["smiles"]
        return {
            "analogs": [
                out[i * n_analogs : (i + 1) * n_analogs]
                for i in range(len(smiles))
            ]
        }

    # ---------------------------------------------------------- lifecycle

    def _warm_embed(self, n: int):
        rows = [self.frontend.tokenize("CCO")] * n
        return self.frontend.embed_rows(rows)

    def warmup(
        self,
        max_bucket: int = 256,
        gen_params: tuple = ((100, 2.0),),
        verbose: bool = True,
    ) -> None:
        """Pre-compile the power-of-two bucket ladder for embed and for
        each (k, inv_temp) generation program.

        The API pads request batches to power-of-two buckets
        (models/api.py bucket_size) so each bucket is one XLA program;
        first-touch compiles take tens of seconds on TPU and would stall
        live traffic. Call once before serving. noise_scale is applied
        host-side, so one generate program per (bucket, k, inv_temp)
        covers every noise level."""
        import time

        bucket = 8
        while bucket <= max_bucket:
            t0 = time.perf_counter()
            h = self._warm_embed(bucket)
            for entry in gen_params:
                # (k, inv_temp) or (k, inv_temp, top_p) — top_p is part
                # of the program key, so warm it explicitly
                k, inv_temp, *rest = entry
                top_p = rest[0] if rest else None
                self.frontend.generate(h, k, inv_temp, 0.0, top_p=top_p)
            if verbose:
                print(
                    f"warmup bucket {bucket}: {time.perf_counter() - t0:.1f}s",
                    flush=True,
                )
            bucket *= 2

    def start(self) -> None:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                blob = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)

            def do_GET(self):
                if self.path == "/healthz":
                    import jax

                    self._send(
                        200,
                        {
                            "status": "ok",
                            "model": "coati2" if server.frontend.is_coati2
                            else "coati",
                            "embed_dim": server.frontend.embed_dim,
                            "device": str(jax.devices()[0]),
                        },
                    )
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                ops = {
                    "/embed": server.op_embed,
                    "/generate": server.op_generate,
                    "/analogs": server.op_analogs,
                }
                op = ops.get(self.path)
                if op is None:
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    self._send(200, op(body))
                except Exception as ex:  # noqa: BLE001 - client error surface
                    self._send(400, {"error": f"{type(ex).__name__}: {ex}"})

        class _Server(ThreadingHTTPServer):
            # socketserver's default accept backlog of 5 drops bursts of
            # concurrent connections (ConnectionResetError client-side)
            request_queue_size = 1024
            daemon_threads = True

        self._httpd = _Server((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="coati-http", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        self._embed_batcher.close()
        for b in self._gen_batchers.values():
            b.close()
