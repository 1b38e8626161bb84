"""Continuous-batching decode engine (slot recycling).

The fused sampler (models/sampler.py) holds every co-batched row until
ALL rows stop, so under the micro-batcher one long molecule makes every
co-batched short request pay max length. This engine fixes that the
TPU-native way — static shapes, jitted segments, host control only at
segment boundaries:

  * a fixed pool of N_SLOTS rows with a RING-BUFFER KV cache lives on
    device. Rows sit at different logical depths, but every row writes
    its K/V at the SAME ring slot each step (a global clock), so the
    cache update stays a scalar-position dynamic_update_slice — the
    pattern XLA aliases in place. Per-row state enters only through
    cheap primitives: rotary tables gathered at each row's logical
    position, and attention masks from ring-AGE arithmetic
    (decode_step_ring / decode_attention_ring). A first version
    scattered at per-row positions instead (decode_step_ragged) and
    measured ~12x slower per token at pool scale — batched scatter
    COPIES the cache; the ring formulation is the TPU-native fix.
  * decode runs in SEGMENTS of `segment_len` tokens compiled as one
    program (early-exiting when every live row stops);
  * between segments the host HARVESTS finished rows (their slots free
    immediately — a short molecule never waits for a long one) and
    ADMITS queued requests into free slots: each admission group is
    prefilled in one program and its prefix K/V placed at the ring
    slots of the preceding clocks. Group sizes are bucketed to powers
    of two, so the engine compiles O(log N_SLOTS) admission programs
    total. Ring width = total_len + segment_len (rounded to 16): a
    row's oldest key ages past overwrite exactly when the row is
    guaranteed finished.

Beyond-parity: the reference has no serving at all (its sampler
re-runs the full prefix per token, smiles_xformer.py:296-311).
Throughput/latency A/B vs the drain-the-batch sampler under mixed
lengths: SERVING.md + scripts/bench_continuous.py; correctness
(ragged == uniform token-for-token, recycling bookkeeping):
tests/test_continuous.py.
"""

from __future__ import annotations

import functools
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from coati_tpu.models.transformer import (
    KVCache,
    TransformerConfig,
    TransformerParams,
    decode_step_ring,
    make_empty_cache,
    prefill,
)
from coati_tpu.ops.sampling import sample_top_k


@struct.dataclass
class PoolState:
    """Device-resident slot pool (LIGHT fields — tens of KB). Rows
    N_SLOTS..n_rows-1 are spare scratch rows (kept never-live; at least
    one, more when a mesh pads the slot axis to split evenly across
    devices). `lpos` is each row's LOGICAL
    position (index of `cur` in its own sequence); `clock` is the
    global ring cursor (mod ring width) — ring slot (clock) is where
    the NEXT step writes every row's K/V.

    The big KV ring buffer lives OUTSIDE this struct (engine.cache) so
    the jitted programs can donate it alone: the light fields come back
    as fresh buffers every segment, which lets the host keep references
    to the PREVIOUS segment's tokens/live/lpos and harvest them while
    the next segment computes (the round-4 pipelined tick — the ~29 ms
    harvest sync no longer serializes with device work)."""

    tokens: jnp.ndarray  # (S+1, W_out) int32
    lpos: jnp.ndarray  # (S+1,) int32
    cur: jnp.ndarray  # (S+1,) int32 — current input token
    live: jnp.ndarray  # (S+1,) bool
    row_max: jnp.ndarray  # (S+1,) int32 — per-request length budget
    clock: jnp.ndarray  # scalar int32, in [0, W_ring)
    rng: jax.Array


@dataclass
class _Request:
    rid: int
    injection: np.ndarray
    max_len: int = 0  # total row budget incl. prefix (0 = engine cap)
    tokens: Optional[np.ndarray] = None  # filled at harvest


class ContinuousDecoder:
    """hclip-conditioned generation with slot recycling: submit
    injection vectors, collect token rows as they finish.

    The v1 surface matches the serving frontend's /generate leg: a
    common token prefix (e.g. [CLIP][UNK][SMILES]) with a per-request
    injection payload over `inject_token`. Sampling params (k,
    inv_temp) are engine-uniform — one compiled segment program."""

    def __init__(
        self,
        params: TransformerParams,
        cfg: TransformerConfig,
        prefix: List[int],
        *,
        n_slots: int = 64,
        total_len: Optional[int] = None,
        stop_token: int,
        pad_token: int = 0,
        inject_token: Optional[int] = None,
        k: int = 100,
        inv_temp: float = 2.0,
        segment_len: int = 48,
        segment_len_hot: Optional[int] = 16,
        pipeline: bool = True,
        adaptive: bool = True,
        seed: int = 0,
        inj_transform=None,
        inj_dim: Optional[int] = None,
        mesh=None,
    ):
        """segment_len_hot: shorter segment program used while requests
        are still WAITING for a slot (admission latency: a waiting
        request gets its slot at the next boundary, so boundaries come
        4x sooner under queue pressure; the full segment_len runs when
        the queue is drained). None disables the second program.

        pipeline: dispatch segment i+1 before harvesting segment i's
        results (the host-side transfer then overlaps device compute;
        a finished row is returned one segment boundary later, which
        the 4x-shorter hot segments more than pay back).

        inj_dim: raw injection width as submitted (defaults to the
        model width; set when inj_transform changes it — warmup() needs
        the pre-transform shape).

        inj_transform: optional jittable (g, D_in) -> (g, D) map
        applied to each admission group INSIDE the jitted admission
        program (e.g. the COATI token-MLP clip_to_special_token) — so
        callers can submit raw clip embeddings at zero extra dispatch
        cost.

        mesh: optional jax.sharding.Mesh — shards the SLOT POOL over
        the mesh's first axis (params replicated). Slot rows are
        independent, so the segment program partitions cleanly (the
        only collective is the while_loop's any(live) reduction) and
        decode — bandwidth-bound on KV-cache reads — splits its cache
        traffic across chips. Admission scatters and the harvest
        device_get cross shards, but those are the engine's existing
        host points. Scratch rows pad the pool to a multiple of the
        mesh size. Sharded == single-device token identity:
        tests/test_continuous.py::test_engine_sharded_matches_single."""
        # jitted segment/admission programs CLOSE OVER the params:
        # ensure device arrays (document-loaded params arrive as numpy,
        # which cannot be indexed by tracers)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.cfg = cfg
        self.prefix = list(prefix)
        self.n_slots = n_slots
        self.w = total_len or cfg.n_seq
        self.stop_token = stop_token
        self.pad_token = pad_token
        self.inject_token = inject_token
        self.k = k
        self.inv_temp = inv_temp
        self.segment_len = segment_len
        self.segment_len_hot = segment_len_hot
        self.pipeline = pipeline
        # adaptive=False pins pipelined harvest ordering regardless of
        # the finish-rate EMA (see step()); only meaningful with
        # pipeline=True
        self.adaptive = adaptive
        self.inj_transform = inj_transform
        self.inj_dim = inj_dim
        assert len(self.prefix) >= 1 and len(self.prefix) < self.w
        assert self.w <= cfg.n_seq, (
            f"total_len {self.w} exceeds the model's rotary range "
            f"(n_seq {cfg.n_seq})"
        )
        # ring width: a row's oldest key reaches overwrite age exactly
        # when the row is past its maximum lifetime; one segment of
        # slack (the longest compiled segment) + 16-alignment
        slack = max(segment_len, segment_len_hot or 0)
        self.w_ring = ((self.w + slack + 15) // 16) * 16

        self.mesh = mesh
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        # >= 1 scratch row (never live), padded so the slot axis splits
        # evenly over the mesh
        s = ((n_slots + 1 + n_dev - 1) // n_dev) * n_dev
        self.n_rows = s
        self.state = PoolState(
            tokens=jnp.zeros((s, self.w), jnp.int32),
            lpos=jnp.zeros((s,), jnp.int32),
            cur=jnp.zeros((s,), jnp.int32),
            live=jnp.zeros((s,), bool),
            row_max=jnp.full((s,), self.w, jnp.int32),
            clock=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(seed),
        )
        # the KV ring lives outside PoolState: it is the ONLY donated
        # buffer, so light fields stay valid for the deferred harvest
        self.cache: KVCache = make_empty_cache(cfg, s, width=self.w_ring)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            ax = mesh.axis_names[0]
            row = NamedSharding(mesh, P(ax))
            rep = NamedSharding(mesh, P())
            cache_sh = NamedSharding(mesh, P(None, None, ax))
            self.params = jax.device_put(self.params, rep)
            self.state = PoolState(
                tokens=jax.device_put(self.state.tokens, row),
                lpos=jax.device_put(self.state.lpos, row),
                cur=jax.device_put(self.state.cur, row),
                live=jax.device_put(self.state.live, row),
                row_max=jax.device_put(self.state.row_max, row),
                clock=jax.device_put(self.state.clock, rep),
                rng=jax.device_put(self.state.rng, rep),
            )
            self.cache = KVCache(
                data=jax.device_put(self.cache.data, cache_sh),
                scale=(jax.device_put(self.cache.scale, cache_sh)
                       if self.cache.scale is not None else None),
            )
        self._free: List[int] = list(range(n_slots))
        self._slot_req: Dict[int, _Request] = {}
        self._pending: List[_Request] = []
        self._done: Dict[int, _Request] = {}
        self._next_rid = 0
        self._lock = threading.Lock()  # guards _pending/_done/_next_rid
        self._segment_jits: Dict[int, object] = {}
        self._admit_cache: Dict[int, object] = {}
        # deferred-harvest snapshot: (live, lpos, tokens) of the last
        # dispatched segment's OUTPUT (fresh, never-donated buffers)
        self._snap = None
        # EMA of the fraction of active slots that finish per harvest —
        # steers the pipeline/sync decision in step(). Starts at 1.0
        # (assume short generations): sequential harvesting is the safe
        # default, and one low-rate harvest flips it toward pipelining.
        self._finish_rate = 1.0

    # ----------------------------------------------------------- device

    def _segment_fn(self, cache: KVCache, state: PoolState, seg_len: int):
        w = self.w
        rows = jnp.arange(state.tokens.shape[0])

        def cond(carry):
            i, _, st = carry
            return (i < seg_len) & jnp.any(st.live)

        def body(carry):
            i, cache, st = carry
            logits, cache = decode_step_ring(
                self.params, self.cfg, st.cur, st.lpos, st.clock, cache
            )
            rng, sub = jax.random.split(st.rng)
            nxt = sample_top_k(
                sub, logits.astype(jnp.float32), self.k, self.inv_temp,
                approx=True, recall_target=self.cfg.topk_recall,
            )
            can = st.live & (st.lpos + 1 < jnp.minimum(w, st.row_max))
            nxt = jnp.where(can, nxt, self.pad_token)
            wpos = jnp.clip(st.lpos + 1, 0, w - 1)
            tokens = st.tokens.at[rows, wpos].set(
                jnp.where(can, nxt, st.tokens[rows, wpos])
            )
            live = can & (nxt != self.stop_token)
            lpos = jnp.where(can, st.lpos + 1, st.lpos)
            cur = jnp.where(can, nxt, st.cur)
            return i + 1, cache, PoolState(
                tokens=tokens, lpos=lpos, cur=cur, live=live,
                row_max=st.row_max,
                clock=jnp.mod(st.clock + 1, self.w_ring),
                rng=rng,
            )

        _, cache, state = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cache, state)
        )
        return cache, state

    def _segment_jit(self, seg_len: int):
        if seg_len not in self._segment_jits:
            self._segment_jits[seg_len] = jax.jit(
                functools.partial(self._segment_fn, seg_len=seg_len),
                donate_argnums=(0,),  # cache only — light fields stay valid
            )
        return self._segment_jits[seg_len]

    def _admit_fn(self, pool_cache: KVCache, state: PoolState, slots, inj,
                  row_max):
        """Prefill `g` new rows on the common prefix with per-row
        injection and scatter them into the pool (g static per
        admission-bucket size — groups are sized to powers of two, so
        the engine compiles at most log2(n_slots)+1 admission
        programs)."""
        g = slots.shape[0]
        rng = state.rng
        if self.inj_transform is not None:
            inj = self.inj_transform(inj)
        p = len(self.prefix)
        ptoks = jnp.broadcast_to(
            jnp.asarray(self.prefix, jnp.int32)[None, :], (g, p)
        )
        cache = make_empty_cache(self.cfg, g, width=max(p, 8))
        hidden, cache = prefill(
            self.params, self.cfg, ptoks,
            injection=inj if self.inject_token is not None else None,
            inject_token=self.inject_token,
            cache=cache,
        )
        last = hidden[:, -1] @ self.params.lm_head.astype(hidden.dtype)
        rng, sub = jax.random.split(rng)
        first = sample_top_k(
            sub, last.astype(jnp.float32), self.k, self.inv_temp,
            approx=True, recall_target=self.cfg.topk_recall,
        )
        tokens = jnp.zeros((g, self.w), jnp.int32)
        tokens = tokens.at[:, :p].set(ptoks)
        tokens = tokens.at[:, p].set(first)

        st_tokens = state.tokens.at[slots].set(tokens)
        st_lpos = state.lpos.at[slots].set(p)
        st_cur = state.cur.at[slots].set(first)
        st_live = state.live.at[slots].set(
            (first != self.stop_token) & (row_max > p + 1)
        )
        st_row_max = state.row_max.at[slots].set(row_max)
        # place the prefix K/V at the ring slots of the p clocks
        # PRECEDING the next step: logical j lands at age p - j
        cols = jnp.mod(state.clock - p + jnp.arange(p), self.w_ring)
        data = pool_cache.data.at[:, :, slots[:, None], cols[None, :]].set(
            cache.data[:, :, :, :p].astype(pool_cache.data.dtype)
        )
        scale = pool_cache.scale
        if scale is not None:
            scale = scale.at[:, :, slots[:, None], cols[None, :]].set(
                cache.scale[:, :, :, :p].astype(scale.dtype)
            )
        # scratch rows (n_slots..n_rows-1) are never live, whatever was
        # scattered into them
        st_live = st_live & (
            jnp.arange(st_live.shape[0]) < self.n_slots
        )
        return KVCache(data=data, scale=scale), PoolState(
            tokens=st_tokens, lpos=st_lpos, cur=st_cur, live=st_live,
            row_max=st_row_max, clock=state.clock, rng=rng,
        )

    def _admit_jit(self, g: int):
        if g not in self._admit_cache:
            self._admit_cache[g] = jax.jit(
                self._admit_fn, donate_argnums=(0,)  # pool cache only
            )
        return self._admit_cache[g]

    # ------------------------------------------------------------- host

    def submit(
        self, injection: np.ndarray, max_new_tokens: Optional[int] = None
    ) -> int:
        """Queue one request; returns a request id. Thread-safe — any
        thread may submit while another drives step()/run_until_done().
        max_new_tokens: optional per-request decode budget (standard
        serving knob; the row retires at the budget even if the model
        hasn't emitted [STOP])."""
        cap = self.w - len(self.prefix)
        budget = (
            cap if max_new_tokens is None
            # admission always realizes the first sampled token, so the
            # smallest honorable budget is 1
            else max(1, min(max_new_tokens, cap))
        )
        with self._lock:
            rid = self._next_rid
            self._next_rid += 1
            self._pending.append(
                _Request(
                    rid=rid,
                    injection=np.asarray(injection, np.float32),
                    max_len=len(self.prefix) + budget,
                )
            )
        return rid

    def _admit_pending(self):
        # drain the queue into free slots in power-of-two groups (see
        # _admit_fn) — e.g. 13 pending over 13 free slots admits as
        # 8+4+1 in one tick rather than leaving stragglers a segment
        while True:
            with self._lock:
                n = min(len(self._pending), len(self._free))
                if n == 0:
                    return
                g = 1
                while g * 2 <= n:
                    g *= 2
                batch = [self._pending.pop(0) for _ in range(g)]
            slots = [self._free.pop(0) for _ in range(g)]
            for r, s in zip(batch, slots):
                self._slot_req[s] = r
            inj = jnp.asarray(
                np.stack([r.injection for r in batch]), self.cfg.compute_dtype
            )
            row_max = jnp.asarray([r.max_len for r in batch], jnp.int32)
            self.cache, self.state = self._admit_jit(g)(
                self.cache, self.state, jnp.asarray(slots, jnp.int32), inj,
                row_max,
            )

    def _harvest(self, snap=None):
        # ONE fixed-shape transfer for everything ((S, W) int32 tokens
        # are ~65 KB): the tunnel charges ~29 ms per host sync, and a
        # variable-length `tokens[finished]` gather compiles a NEW tiny
        # program per distinct finished-count — one such first-hit
        # mid-load measured as a 13 s straggler. In pipelined mode
        # `snap` holds the PREVIOUS segment's output arrays plus the
        # slot set occupied AT SNAPSHOT TIME, so this transfer overlaps
        # the segment the device is computing now.
        if snap is None:
            if not self._slot_req:
                return  # nothing occupies a slot; skip the ~29 ms sync
            arrays = (self.state.live, self.state.lpos, self.state.tokens)
            snap_slots = set(self._slot_req)
        else:
            arrays = snap[:3]
            # slots admitted AFTER the snapshot have stale live=False
            # in it — restricting to the snapshot's own slot set keeps
            # a just-admitted request from being reaped with old tokens
            snap_slots = snap[3]
        live, pos, tokens = jax.device_get(arrays)
        # a slot finished in the snapshot is dead in every later state
        # (dead rows never revive) and its token row is frozen, so
        # harvesting one boundary late is exact
        finished = [
            s for s, r in list(self._slot_req.items())
            if s in snap_slots and not live[s]
        ]
        active = sum(1 for s in self._slot_req if s in snap_slots)
        if active:
            self._finish_rate = 0.5 * self._finish_rate + 0.5 * (
                len(finished) / active
            )
        if not finished:
            return
        with self._lock:
            for s in finished:
                r = self._slot_req.pop(s)
                r.tokens = tokens[s, : pos[s] + 1]
                self._done[r.rid] = r
                self._free.append(s)

    def warmup(self, group_sizes=None):
        """Precompile the segment program and every admission program
        (power-of-two group sizes up to n_slots) before serving traffic
        — compiles run 15-20 s each on a cold device, and an admission
        size first hit mid-load would stall every in-flight request.
        Runs against a CLONE of the pristine state; engine state and
        bookkeeping are untouched."""
        if group_sizes is None:
            group_sizes = []
            g = 1
            while g <= self.n_slots:
                group_sizes.append(g)
                g *= 2
        d_in = self.inj_dim or self.cfg.n_embd
        for g in group_sizes:
            cache_c = jax.tree_util.tree_map(jnp.copy, self.cache)
            inj = jnp.zeros((g, d_in), self.cfg.compute_dtype)
            _, out = self._admit_jit(g)(
                cache_c, self.state, jnp.arange(g, dtype=jnp.int32), inj,
                jnp.full((g,), self.w, jnp.int32),
            )
            np.asarray(out.live)
        seg_lens = [self.segment_len]
        if self.segment_len_hot and self.segment_len_hot != self.segment_len:
            seg_lens.append(self.segment_len_hot)
        for sl in seg_lens:
            cache_c = jax.tree_util.tree_map(jnp.copy, self.cache)
            clone = self.state.replace(live=self.state.live.at[0].set(True))
            _, out = self._segment_jit(sl)(cache_c, clone)
            np.asarray(out.live)

    def step(self):
        """One engine tick: admit -> dispatch one decode segment ->
        harvest. Pipelined (default): the harvest reads the PREVIOUS
        segment's output while the device computes the new one, so the
        ~29 ms host transfer no longer serializes with device work.
        The segment length adapts to queue pressure: requests still
        waiting for a slot get boundaries `segment_len_hot` tokens
        apart instead of `segment_len`.

        ADAPTIVE harvest order: a deferred harvest returns finished
        rows one boundary late, which idles their slots for a whole
        extra segment. When generations are short (most active rows
        finish every segment) AND requests are queued for those slots,
        that idle time dominates the ~29 ms sync the pipeline saves —
        measured 0.40x vs drain-batching on a short-generation load.
        So when the finish-rate EMA says recycling is the bottleneck,
        harvest the outstanding snapshot BEFORE dispatching and admit
        into the freed slots this tick (the round-3 sequential order);
        pipeline otherwise (the long-tail regime, where it measures
        1.08x throughput / 0.60x p50 vs drain)."""
        self._admit_pending()
        with self._lock:
            queued = bool(self._pending)
        if (self.adaptive and self._snap is not None and queued
                and self._finish_rate > 0.25):
            snap, self._snap = self._snap, None
            self._harvest(snap)
            self._admit_pending()  # reuse freed slots THIS segment
        dispatched = False
        if self._slot_req:
            with self._lock:
                hot = bool(self._pending) and bool(self.segment_len_hot)
            seg = self.segment_len_hot if hot else self.segment_len
            self.cache, self.state = self._segment_jit(seg)(
                self.cache, self.state
            )
            dispatched = True
        harvested_snap = False
        if self._snap is not None:
            snap, self._snap = self._snap, None
            self._harvest(snap)
            harvested_snap = True
        if dispatched and self.pipeline:
            # light fields are fresh (never-donated) buffers: safe to
            # hold across the next tick's admissions/segment; the slot
            # set is captured NOW (slots admitted later are excluded)
            self._snap = (self.state.live, self.state.lpos,
                          self.state.tokens, set(self._slot_req))
        elif not (harvested_snap and not dispatched):
            # drain-tail guard: with no dispatch this tick, the device
            # state is IDENTICAL to the snapshot just harvested — a
            # second device_get would re-read the same arrays for
            # nothing (two ~29 ms syncs per run_until_done tail)
            self._harvest()

    def run_until_done(self, max_segments: int = 10_000):
        """Drain everything queued/in-flight; returns {rid: tokens}."""
        n = 0
        while (self._pending or self._slot_req or self._snap is not None) \
                and n < max_segments:
            self.step()
            n += 1
        return self.results()

    def results(self) -> Dict[int, np.ndarray]:
        return {rid: r.tokens for rid, r in self._done.items()}

    def pop_results(self) -> Dict[int, np.ndarray]:
        """Drain completed requests (each returned exactly once)."""
        with self._lock:
            out = {rid: r.tokens for rid, r in self._done.items()}
            self._done.clear()
        return out

    @property
    def n_active(self) -> int:
        return len(self._slot_req)


class ContinuousService:
    """MicroBatcher-compatible facade over a ContinuousDecoder: submit()
    returns a Future, a daemon driver thread ticks the engine whenever
    work is queued or in flight, and each finished row resolves ITS
    future at the next segment boundary — no drain-the-cohort coupling.
    `decode_fn(tokens) -> result` maps a finished token row (prefix
    included, stop inclusive) to the caller-facing payload."""

    def __init__(self, engine: ContinuousDecoder, decode_fn,
                 idle_sleep: float = 0.005, name: str = "continuous"):
        from concurrent.futures import Future

        self._engine = engine
        self._decode_fn = decode_fn
        self._idle_sleep = idle_sleep
        self._futures: Dict[int, "Future"] = {}
        self._lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(
            target=self._run, name=name, daemon=True
        )
        self._thread.start()

    def submit(self, inj_row):
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("service is closed")
        fut: Future = Future()
        rid = self._engine.submit(inj_row)
        with self._lock:
            self._futures[rid] = fut
        return fut

    def __call__(self, inj_row):
        return self.submit(inj_row).result()

    def _run(self):
        import time as _time

        while not self._closed:
            eng = self._engine
            if eng._pending or eng.n_active:
                try:
                    eng.step()
                except Exception as ex:  # noqa: BLE001 — fail all waiters
                    with self._lock:
                        futs, self._futures = self._futures, {}
                    for f in futs.values():
                        if not f.done():
                            f.set_exception(ex)
                    continue
                for rid, tokens in eng.pop_results().items():
                    with self._lock:
                        fut = self._futures.pop(rid, None)
                    if fut is not None and not fut.done():
                        try:
                            fut.set_result(self._decode_fn(tokens))
                        except Exception as ex:  # noqa: BLE001
                            fut.set_exception(ex)
            else:
                _time.sleep(self._idle_sleep)

    def close(self, timeout: float = 5.0):
        self._closed = True
        self._thread.join(timeout)
        with self._lock:
            futs, self._futures = self._futures, {}
        for f in futs.values():
            if not f.done():
                f.set_exception(RuntimeError("service is closed"))
