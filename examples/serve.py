"""Serve a COATI / COATI2 model document over HTTP (micro-batched).

Usage:
    python examples/serve.py --doc_url /path/to/model.pkl [--port 8000]
    python examples/serve.py --doc_url ... --coati2          # COATI2 doc
    python examples/serve.py --tiny                          # smoke model

Then:
    curl localhost:8000/healthz
    curl -X POST localhost:8000/embed -d '{"smiles": ["CCO"]}'
    curl -X POST localhost:8000/analogs \
         -d '{"smiles": ["CCO"], "n_analogs": 4, "noise_scale": 0.3}'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="COATI inference server")
    parser.add_argument("--doc_url", type=str, default=None)
    parser.add_argument("--coati2", action="store_true")
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny model (mechanics smoke test)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=256)
    parser.add_argument("--flush_ms", type=float, default=20.0)
    args = parser.parse_args()

    if args.tiny:
        import jax

        from coati_tpu.models.api import COATI
        from coati_tpu.models.coati import CoatiConfig, init_coati
        from coati_tpu.tokenizers import get_vocab
        from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer

        tokenizer = TrieTokenizer(n_seq=64, **get_vocab("mar"))
        cfg = CoatiConfig(
            n_layer_e3gnn=2, n_layer_xformer=3, n_hidden_xformer=64,
            n_hidden_e3nn=64, n_embd_common=64, n_head=4, n_seq=64,
            n_tok=tokenizer.n_token, norm_clips=True, token_mlp=True,
        )
        model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    elif args.coati2:
        from coati_tpu.models.io import load_coati2

        model, tokenizer = load_coati2(args.doc_url)
    else:
        from coati_tpu.models.io import load_e3gnn_smiles_clip_e2e

        model, tokenizer = load_e3gnn_smiles_clip_e2e(args.doc_url)

    from coati_tpu.serving.server import CoatiInferenceServer

    server = CoatiInferenceServer(
        model, tokenizer, host=args.host, port=args.port,
        max_batch=args.max_batch, flush_ms=args.flush_ms,
    )
    print("pre-compiling bucket ladder...")
    server.warmup(max_bucket=args.max_batch)
    server.start()
    print(f"serving on http://{args.host}:{server.port} "
          f"(max_batch {args.max_batch}, flush {args.flush_ms} ms)")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
