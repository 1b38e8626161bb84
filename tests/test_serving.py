"""Serving-layer tests: micro-batcher semantics and the HTTP server
end-to-end over localhost with a tiny model (beyond-parity — the
reference has no serving layer)."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from coati_tpu.models.api import COATI
from coati_tpu.models.coati import CoatiConfig, init_coati
from coati_tpu.serving.batcher import MicroBatcher
from coati_tpu.serving.server import CoatiInferenceServer
from coati_tpu.tokenizers import get_vocab
from coati_tpu.tokenizers.trie_tokenizer import TrieTokenizer


# ----------------------------------------------------------- MicroBatcher


def test_batcher_batches_concurrent_submits():
    seen = []

    def batch_fn(items):
        seen.append(len(items))
        time.sleep(0.01)
        return [x * 2 for x in items]

    b = MicroBatcher(batch_fn, max_batch=64, flush_ms=50)
    try:
        futs = [b.submit(i) for i in range(20)]
        assert [f.result(timeout=5) for f in futs] == [2 * i for i in range(20)]
        # all 20 coalesced into very few device calls
        assert sum(seen) == 20 and len(seen) <= 3
    finally:
        b.close()


def test_batcher_respects_max_batch():
    seen = []

    def batch_fn(items):
        seen.append(len(items))
        return items

    b = MicroBatcher(batch_fn, max_batch=4, flush_ms=100)
    try:
        futs = [b.submit(i) for i in range(10)]
        [f.result(timeout=5) for f in futs]
        assert max(seen) <= 4
    finally:
        b.close()


def test_batcher_propagates_errors():
    def batch_fn(items):
        raise RuntimeError("boom")

    b = MicroBatcher(batch_fn, max_batch=4, flush_ms=5)
    try:
        fut = b.submit(1)
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=5)
        # the worker survives an error and keeps serving
        fut2 = b.submit(2)
        with pytest.raises(RuntimeError, match="boom"):
            fut2.result(timeout=5)
    finally:
        b.close()


# ------------------------------------------------------------ HTTP server


@pytest.fixture(scope="module")
def server():
    tok = TrieTokenizer(n_seq=48, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1,
        n_layer_xformer=2,
        n_hidden_xformer=32,
        n_hidden_e3nn=16,
        n_embd_common=32,
        n_head=2,
        n_seq=48,
        n_tok=tok.n_token,
        norm_clips=True,
        token_mlp=True,
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    srv = CoatiInferenceServer(model, tok, port=0, flush_ms=10)
    srv.start()
    yield srv
    srv.stop()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["embed_dim"] == 32


def test_embed_generate_roundtrip(server):
    out = _post(server, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
    h = np.asarray(out["embeddings"], np.float32)
    assert h.shape == (3, 32) and np.isfinite(h).all()

    gen = _post(server, "/generate", {"embeddings": h.tolist(), "k": 8})
    assert len(gen["smiles"]) == 3
    assert all(isinstance(s, str) for s in gen["smiles"])


def test_analogs_endpoint(server):
    out = _post(
        server, "/analogs",
        {"smiles": ["CCO"], "n_analogs": 3, "noise_scale": 0.5, "k": 8},
    )
    assert len(out["analogs"]) == 1 and len(out["analogs"][0]) == 3


def test_concurrent_requests_batch_on_device(server):
    """16 parallel clients share device programs and all get answers."""
    results = [None] * 16
    errors = []

    def client(i):
        try:
            out = _post(server, "/embed", {"smiles": ["CCO"]})
            results[i] = np.asarray(out["embeddings"])
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors
    ref = results[0]
    for r in results[1:]:
        np.testing.assert_allclose(r, ref, atol=1e-5)


def test_generate_rejects_bad_shapes(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=json.dumps({"embeddings": [[1.0, 2.0]]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


def test_server_over_device_mesh():
    """Serving over an 8-device mesh (ShardedCOATI): requests split over
    the data axis and results match the single-device server."""
    from coati_tpu.parallel.mesh import make_mesh

    tok = TrieTokenizer(n_seq=48, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=16, n_embd_common=32, n_head=2, n_seq=48,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    srv = CoatiInferenceServer(model, tok, port=0, flush_ms=10,
                               mesh=make_mesh(8))
    srv.start()
    try:
        out = _post(srv, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
        h = np.asarray(out["embeddings"], np.float32)
        assert h.shape == (3, 32) and np.isfinite(h).all()
        # matches unsharded embedding
        ref = np.asarray(model.encode_tokens(
            np.asarray([tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
                        for s in ["CCO", "CC", "CCC"]], np.int32), tok))
        np.testing.assert_allclose(h, ref, atol=2e-5)
        gen = _post(srv, "/generate", {"embeddings": h.tolist(), "k": 8})
        assert len(gen["smiles"]) == 3
    finally:
        srv.stop()


def test_server_coati2_over_device_mesh():
    """COATI2 + mesh (round 4: previously rejected with
    NotImplementedError): the server wraps the model in ShardedCOATI2
    and embeddings match the single-device COATI2."""
    from coati_tpu.models.coati2 import COATI2, Coati2Config, init_coati2
    from coati_tpu.parallel.mesh import make_mesh

    tok = TrieTokenizer(n_seq=48, **get_vocab("coati2_12_12"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=48, enc_to_coati="swiglu_resnet", n_tok=tok.n_token,
    )
    model = COATI2(init_coati2(jax.random.PRNGKey(0), cfg), cfg)
    srv = CoatiInferenceServer(model, tok, port=0, flush_ms=10,
                               mesh=make_mesh(8))
    srv.start()
    try:
        out = _post(srv, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
        h = np.asarray(out["embeddings"], np.float32)
        assert h.shape == (3, 32) and np.isfinite(h).all()
        ref = np.asarray(model.encode_tokens(
            np.asarray([tok.tokenize_text("[SMILES]" + s + "[STOP]", pad=True)
                        for s in ["CCO", "CC", "CCC"]], np.int32), tok))
        np.testing.assert_allclose(h, ref, atol=2e-5)
        gen = _post(srv, "/generate", {"embeddings": h.tolist(), "k": 8})
        assert len(gen["smiles"]) == 3
    finally:
        srv.stop()


def test_bad_smiles_does_not_poison_cobatched_requests(server):
    """A tokenization failure 400s only its own request while concurrent
    valid requests still succeed."""
    results, errors = [], []

    def good():
        try:
            results.append(_post(server, "/embed", {"smiles": ["CCO"]}))
        except Exception as ex:  # noqa: BLE001
            errors.append(("good", ex))

    def bad():
        try:
            _post(server, "/embed", {"smiles": ["C" * 5000]})  # oversized
            errors.append(("bad", "should have failed"))
        except urllib.error.HTTPError as ex:
            assert ex.code == 400
        except Exception as ex:  # noqa: BLE001
            errors.append(("bad", ex))

    threads = [threading.Thread(target=good) for _ in range(4)] + [
        threading.Thread(target=bad) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors
    assert len(results) == 4


def test_server_continuous_mode():
    """continuous=True serves /generate through the slot-pool engine:
    concurrent mixed requests all complete, and top_p requests fall
    back to the micro-batcher (engine doesn't compile top_p)."""
    from coati_tpu.serving.batcher import MicroBatcher
    from coati_tpu.serving.continuous import ContinuousService

    tok = TrieTokenizer(n_seq=48, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=16, n_embd_common=32, n_head=2, n_seq=48,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    srv = CoatiInferenceServer(
        model, tok, port=0, continuous=True, n_slots=4
    )
    srv.start()
    try:
        out = _post(srv, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
        h = out["embeddings"]
        gen = _post(srv, "/generate", {"embeddings": h * 2, "k": 8})
        assert len(gen["smiles"]) == 6
        assert all(isinstance(s, str) for s in gen["smiles"])
        assert isinstance(
            srv._gen_batcher(8, 2.0), ContinuousService
        )
        # top_p routes to the micro-batcher fallback
        gen2 = _post(
            srv, "/generate",
            {"embeddings": h, "k": 8, "top_p": 0.9},
        )
        assert len(gen2["smiles"]) == 3
        assert isinstance(srv._gen_batcher(8, 2.0, 0.9), MicroBatcher)
    finally:
        srv.stop()


def test_server_continuous_mode_coati2():
    """continuous=True + COATI2 (round 5: previously rejected with
    NotImplementedError): /generate rides the slot-pool engine with the
    coati_to_token injection transform; requests complete and the
    batcher for the config is a ContinuousService."""
    from coati_tpu.models.coati2 import COATI2, Coati2Config, init_coati2
    from coati_tpu.serving.continuous import ContinuousService

    tok = TrieTokenizer(n_seq=48, **get_vocab("coati2_12_12"))
    cfg = Coati2Config(
        n_layer_xformer=2, n_hidden_xformer=32, embed_dim=32, n_head=2,
        n_seq=48, n_tok=tok.n_token,
    )
    model = COATI2(init_coati2(jax.random.PRNGKey(0), cfg), cfg)
    srv = CoatiInferenceServer(
        model, tok, port=0, continuous=True, n_slots=4
    )
    srv.start()
    try:
        out = _post(srv, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
        h = out["embeddings"]
        gen = _post(srv, "/generate", {"embeddings": h * 2, "k": 8})
        assert len(gen["smiles"]) == 6
        assert all(isinstance(s, str) for s in gen["smiles"])
        assert isinstance(srv._gen_batcher(8, 2.0), ContinuousService)
    finally:
        srv.stop()


def test_server_continuous_over_device_mesh():
    """continuous=True + mesh (round 5: previously rejected with
    NotImplementedError): the slot pool shards over the data axis
    (ContinuousDecoder(mesh=...)) and /generate completes through it."""
    from coati_tpu.parallel.mesh import make_mesh
    from coati_tpu.serving.continuous import ContinuousService

    tok = TrieTokenizer(n_seq=48, **get_vocab("mar_verysimple"))
    cfg = CoatiConfig(
        n_layer_e3gnn=1, n_layer_xformer=2, n_hidden_xformer=32,
        n_hidden_e3nn=16, n_embd_common=32, n_head=2, n_seq=48,
        n_tok=tok.n_token, norm_clips=True, token_mlp=True,
    )
    model = COATI(init_coati(jax.random.PRNGKey(0), cfg), cfg)
    mesh = make_mesh(8)
    srv = CoatiInferenceServer(
        model, tok, port=0, continuous=True, n_slots=8, mesh=mesh
    )
    srv.start()
    try:
        out = _post(srv, "/embed", {"smiles": ["CCO", "CC", "CCC"]})
        h = out["embeddings"]
        gen = _post(srv, "/generate", {"embeddings": h * 4, "k": 8})
        assert len(gen["smiles"]) == 12
        assert all(isinstance(s, str) for s in gen["smiles"])
        svc = srv._gen_batcher(8, 2.0)
        assert isinstance(svc, ContinuousService)
        assert svc._engine.mesh is mesh
        assert svc._engine.n_rows % 8 == 0
    finally:
        srv.stop()
