"""Slot-based continuous batching engine (in-flight request admission).

Beyond the admission-batched scheduler (`serve.py`), this engine keeps ONE
persistent decode batch of ``max_slots`` sequences alive and lets requests
join it *between decode chunks*: a request arriving mid-decode is vision-
encoded, spliced, prefilled into a free slot of the persistent KV cache, and
decodes alongside the requests already in flight — no waiting for the
current batch to finish. TPU economics make this nearly free: bs-1 decode is
weight-bandwidth-bound, so stepping 8 slots costs almost the same as
stepping 1 (PERF.md), and every occupied slot is pure extra throughput.
This is also what makes concurrent STREAMS scale — in the admission
scheduler each stream owns the device for its whole reply (serialized);
here all active streams share each weight pass.

Mechanics (all shapes static):
- Persistent state: a ``[L, max_slots, Hkv, S, D]`` KV cache with
  ``S = max_seq_len + max_new_cap`` positions, plus host-side numpy
  ``cache_len`` / ``cur`` / ``done`` per slot (idle slot == done).
- Admission is PIPELINED and BATCHED (round-5 redesign; the round-4
  loadtest measured the old inline admission as the bottleneck — the
  ~7 s per-request chain of host-synced dispatches serialized against
  decode, 0.15 req/s while all decode work was 3.5 s of a 236 s window):
  a dedicated admitter thread runs the expensive per-request chain (video
  host→device transfer → vision encode → splice → prefill) while the
  decode worker keeps dispatching chunks, and every request queued at the
  same time rides ONE batched encode/splice/prefill dispatch chain
  (row-independent, so per-request outputs are unchanged). The decode
  worker only performs the cheap slot splice (``_copy_slot`` /
  ``spec_slot_admit``) between chunks. Prepared-but-unspliced scratch
  caches are bounded by the free-slot count, so admission-ahead never
  exceeds the slot budget's HBM.
- Exactness: ``prefill_start`` runs on a 256-bucketed-length scratch
  cache (a bounded set of compile variants); ``_copy_slot`` writes one
  request's K/V rows into its slot. The ragged decode kernel and every
  batched admission stage are row-independent, so a slot's tokens are
  bit-identical to what the request would produce alone — batchmates
  never perturb outputs (tests pin engine text == mm_infer text under
  staggered admission, batched and solo).
- Stepping: one ``decode_chunk`` dispatch advances every active slot
  ``chunk`` tokens; finished slots (eos, budget, host-side stop string)
  retire between chunks and free their slot.

Scope: greedy QA generation (the serving hot path). Sampling requests need
per-slot rng/temperature vectors and seg requests need the full-pass hidden
states — both fall back to the classic paths (`serve.BatchingScheduler`,
`api.mm_infer`). ``spec_k > 0`` composes slot batching with prompt-lookup
speculative decoding: the spec loop state is batch-shaped, so each engine
step is one draft→verify pass over every active slot (1..K+1 tokens per
slot per weight pass); admission resets one state row
(`speculative.spec_slot_admit`) and per-slot retirement ORs a host mask in
(`spec_set_done`).
"""

from __future__ import annotations

import functools
import queue as queue_mod
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .api import UFVideoRuntime, _assemble_input_ids, _encode_video_input
from .constants import DEFAULT_IMAGE_TOKEN, DEFAULT_VIDEO_TOKEN
from .mm_utils import TextDeltaStreamer
from .models.generate import decode_chunk, prefill_start
from .models.qwen2 import make_kv_cache
from .serve import ServeFuture, StreamFuture
from .splicing import plan_splice

__all__ = ["StreamingEngine"]


@dataclass
class _EngineRequest:
    sample: Dict[str, Any]
    modal: str
    choice: int
    gen: Dict[str, Any]
    future: Any  # StreamFuture (stream) or ServeFuture (collected)
    stream: bool
    t_enqueue: float = field(default_factory=time.perf_counter)


class _SlotState:
    """Host bookkeeping for one occupied slot."""

    def __init__(self, req: _EngineRequest, tokenizer):
        self.req = req
        # safe incremental text deltas: trailing-U+FFFD holdback + a
        # stop-string reserve window (mm_utils.TextDeltaStreamer)
        self.streamer = TextDeltaStreamer(
            tokenizer, req.gen.get("stop_strings") or []
        )
        self.n_tokens = 0  # tokens consumed toward max_new
        self.max_new = int(req.gen.get("max_new_tokens", 1024))
        self.finished = False


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_slot(cache, scratch, slot, src=0):
    """Write row ``src`` of a scratch cache into batch row ``slot`` of the
    persistent cache (scratch S may be shorter than the persistent S; the
    batched admission pipeline prefills several queued requests into one
    scratch, one row each).

    The persistent cache is DONATED: at real config it is ~3.9 GB
    (28L x 2 x [8, 4, 4224, 128] bf16), and a functional copy would double
    it in HBM exactly while the admitter thread holds its own encode/
    prefill transients — measured on-chip as RESOURCE_EXHAUSTED admission
    failures (2026-08-19). Aliasing makes the install a true in-place row
    write."""
    return jax.tree.map(
        lambda c, p: jax.lax.dynamic_update_slice(
            c,
            jax.lax.dynamic_slice_in_dim(p, src, 1, axis=1).astype(c.dtype),
            (0, slot) + (0,) * (p.ndim - 2),
        ),
        cache, scratch,
    )


@dataclass
class _Prepared:
    """A request after the expensive admission chain, awaiting only its
    slot splice on the decode worker."""

    req: _EngineRequest
    scratch: Any  # prefilled scratch KV cache (possibly multi-row)
    src: int  # this request's row in ``scratch``
    t0: int  # first generated token (from the prefill dispatch)
    real_len: int  # un-padded prompt length
    lookup_ids: Optional[np.ndarray]  # spec mode: [S] prompt-lookup row


class StreamingEngine:
    """Continuous-batching QA engine with the scheduler-compatible surface
    (``submit`` / ``submit_stream`` / ``stats`` / ``close``), so
    ``serve.serve_http`` can front either."""

    def __init__(
        self,
        model: UFVideoRuntime,
        tokenizer,
        max_slots: int = 8,
        chunk: int = 8,
        max_new_cap: int = 512,
        max_queue: int = 256,
        spec_k: int = 0,
        admit_batch: int = 0,
        admit_chunk: int = 4,
        admitters: int = 0,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer
        self.max_slots = int(max_slots)
        self.chunk = int(chunk)
        self.max_new_cap = int(max_new_cap)
        # cap on how many queued requests share one admission dispatch
        # chain (default: the slot count). Lower it when scratch-prefill
        # HBM transients at full width are too tight for the chip.
        self.admit_batch = int(admit_batch) or self.max_slots
        # cap on how many of those ride one transfer/encode/splice/prefill
        # dispatch (HBM-transient bound; see _prepare_video_group)
        self.admit_chunk = max(int(admit_chunk), 1)
        import os as _os

        # Concurrent admitter threads. The admission chain is LATENCY-bound
        # on remote runtimes (each stage dispatch + the prefill t0 readback
        # pays tunnel RTT while the chip is mostly idle), so two in-flight
        # chains pipeline: batch B dispatches its encode while batch A waits
        # on its readback. The chip serializes the actual work either way;
        # slot claims are atomic under _admit_lock.
        self.n_admitters = max(
            int(admitters)
            or int(_os.environ.get("UFVIDEO_ENGINE_ADMITTERS", "2") or 2),
            1,
        )
        # client-thread device transfer (see _prestage); =0 keeps pixels
        # host-side until admission
        self._prestage_dev = (
            _os.environ.get("UFVIDEO_ENGINE_PRESTAGE", "1") != "0"
        )
        # env-gated per-stage fences in the admission chain (tiny readbacks
        # — block_until_ready is a no-op on remote runtimes) so prep_s
        # decomposes into transfer/encode/splice/prefill for PERF analysis
        self._stage_sync = (
            _os.environ.get("UFVIDEO_ENGINE_STAGE_SYNC", "") == "1"
        )
        # spec_k > 0: slot batching composes with prompt-lookup speculative
        # decoding — the spec loop state is already batch-shaped, so each
        # step is one draft→verify pass over every active slot (1..K+1
        # tokens per slot per weight pass); admission resets one row
        # (models/speculative.spec_slot_admit)
        self.spec_k = int(spec_k)
        cfg = model.cfg
        self.cache_positions = -(
            -(cfg.budget.max_seq_len + self.max_new_cap + self.spec_k) // 128
        ) * 128
        self._queue: "queue_mod.Queue[_EngineRequest]" = queue_mod.Queue(
            maxsize=int(max_queue)
        )
        self._closing = False
        self.stats_lock = threading.Lock()
        self._stats = {
            "requests": 0, "completed": 0, "errors": 0, "chunks": 0,
            "admissions": 0, "spec_drafted": 0, "spec_accepted": 0,
            # admission-pipeline telemetry. Host wall seconds at the
            # thread's sync points — on remote runtimes dispatches are
            # async and block_until_ready is a no-op, so "prep_s" (ends at
            # the prefill t0 readback) absorbs the whole upstream chain
            # and "step_s" (ends at the chunk token readback) absorbs the
            # decode dispatches.
            "admit_batches": 0, "admit_batched_requests": 0,
            "prep_s": 0.0, "install_s": 0.0, "step_s": 0.0,
        }
        # host copy of the per-slot spec counters as of the LAST step; rows
        # accumulate into the cumulative stats at retirement (the device
        # rows reset on every admission, so live rows alone undercount)
        self._slot_spec_counts = None
        self._lat: List[float] = []

        # persistent device state (built lazily on first admission so an
        # idle engine costs no HBM)
        self._cache = None
        self._spec_state = None  # spec mode: the 11-tuple spec loop state
        # host-side per-slot state
        self._slots: List[Optional[_SlotState]] = [None] * self.max_slots
        self._cache_len = np.zeros(self.max_slots, np.int32)
        self._cur = np.zeros(self.max_slots, np.int32)
        self._done = np.ones(self.max_slots, bool)  # idle == done
        self._forced_done = np.zeros(self.max_slots, bool)  # spec mode

        # admission pipeline: the admitter thread prepares requests
        # (transfer/encode/splice/prefill — batched across everything
        # queued) into ``_ready``; the decode worker splices them into
        # slots between chunks. ``_reserved`` holds slot indices claimed
        # by in-flight preparations so prepared scratch HBM stays bounded
        # by the slot budget (only the admitter adds, only the worker —
        # after occupying the slot — removes).
        self._ready: "queue_mod.Queue" = queue_mod.Queue()
        self._reserved: set = set()
        self._admit_lock = threading.Lock()

        self._worker = threading.Thread(
            target=self._run, name="ufvideo-engine", daemon=True
        )
        self._admitters = [
            threading.Thread(
                target=self._admit_loop, name=f"ufvideo-admit-{i}",
                daemon=True,
            )
            for i in range(self.n_admitters)
        ]
        self._worker.start()
        for t in self._admitters:
            t.start()

    # ---------------- client surface ----------------

    def _check(self, sample: Dict[str, Any], gen: Dict[str, Any]) -> None:
        if gen.get("do_sample"):
            raise ValueError(
                "engine mode is greedy-only; route sampling requests "
                "through the BatchingScheduler"
            )
        if sample.get("images_sam") is not None:
            raise ValueError(
                "engine mode is QA-only ([SEG]/mask decoding needs the "
                "full-pass mm_infer path)"
            )
        if int(gen.get("max_new_tokens", 1024)) > self.max_new_cap:
            raise ValueError(
                f"max_new_tokens exceeds the engine cap {self.max_new_cap}"
            )

    def _prestage(self, sample: Dict[str, Any]) -> None:
        """Client-thread staging of the video payload: cast f32 pixels to
        bf16 (encode-bit-identical — the tower computes in bf16; halves the
        host→device bytes) and, while the admitter is not backlogged, start
        the host→device transfer here too. Both used to run serially inside
        the admitter thread, where stacking + casting one 4-video f32 group
        costs seconds of its per-batch budget (measured 2026-08-20); on the
        client threads N submissions stage concurrently and overlap decode.
        The queue-depth guard bounds device pixel residency to roughly
        ``max_slots`` in-flight videos so prestaging can never OOM a loaded
        engine — backlogged requests stay host-side until admission."""
        vid = sample.get("video")
        if vid is None or isinstance(vid, jax.Array):
            return
        arr = np.asarray(vid)
        if (
            arr.dtype == np.float32
            and self.model.cfg.compute_dtype == jnp.bfloat16
        ):
            import ml_dtypes

            arr = arr.astype(ml_dtypes.bfloat16)
            sample["video"] = arr
        if self._prestage_dev and self._queue.qsize() < self.max_slots:
            sample["video"] = jax.device_put(arr)

    def _submit(self, sample, modal, choice, gen, stream) -> Any:
        self._check(sample, gen)
        fut = StreamFuture() if stream else ServeFuture()
        req = _EngineRequest(dict(sample), modal, int(choice), dict(gen),
                             fut, stream)
        if self._closing:
            raise RuntimeError("engine is closed")
        self._prestage(req.sample)
        try:
            self._queue.put_nowait(req)
        except queue_mod.Full:
            raise RuntimeError(f"queue full ({self._queue.maxsize} pending)")
        return fut

    def submit(self, sample, modal="video", choice=1, **gen) -> ServeFuture:
        """Non-streaming request: resolves to ``(text, out_dict)`` like the
        scheduler (pred_masks always empty — QA engine)."""
        return self._submit(sample, modal, choice, gen, stream=False)

    def submit_stream(self, sample, modal="video", choice=1, **gen) -> StreamFuture:
        return self._submit(sample, modal, choice, gen, stream=True)

    def stats(self) -> Dict[str, Any]:
        with self.stats_lock:
            s = dict(self._stats)
            lat = sorted(self._lat[-512:])
        for key in ("prep_s", "install_s", "step_s"):
            s[key] = round(s[key], 3)
        s["active_slots"] = sum(sl is not None for sl in self._slots)
        # pending = queued + prepared-awaiting-splice (the admission
        # pipeline's in-flight work is not yet an "admission")
        s["pending"] = self._queue.qsize() + self._ready.qsize()
        if self.spec_k:
            # cumulative (retired requests) + the live slots' rows as of
            # the last step (device rows reset on every admission)
            live_d = live_a = 0
            if self._slot_spec_counts is not None:
                live_d = int(self._slot_spec_counts[0].sum())
                live_a = int(self._slot_spec_counts[1].sum())
            s["spec"] = {
                "drafted": s.pop("spec_drafted") + live_d,
                "accepted": s.pop("spec_accepted") + live_a,
            }
        else:
            s.pop("spec_drafted", None)
            s.pop("spec_accepted", None)
        if lat:
            s["latency_s"] = {
                "p50": round(lat[len(lat) // 2], 4),
                "p95": round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 4),
            }
        return s

    def close(self, timeout: float = 120.0) -> None:
        self._closing = True
        t0 = time.perf_counter()
        for t in self._admitters:
            t.join(max(timeout - (time.perf_counter() - t0), 0.1))
        self._worker.join(max(timeout - (time.perf_counter() - t0), 0.1))

    def __enter__(self) -> "StreamingEngine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---------------- admitter (preparation pipeline) ----------------

    def _free_unreserved(self) -> List[int]:
        return [
            i for i, s in enumerate(self._slots)
            if s is None and i not in self._reserved
        ]

    def _deliver_error(self, req: _EngineRequest, exc: BaseException) -> None:
        with self.stats_lock:
            self._stats["errors"] += 1
        if req.stream:
            req.future.finish(exc)
        else:
            req.future.set_exception(exc)

    def _admit_loop(self) -> None:
        """Admitter thread: run the expensive per-request chain (video
        transfer → vision encode → splice → prefill) off the decode
        worker, batching everything queued at the same time into one
        dispatch chain. Decode chunks keep dispatching while this runs —
        the two only meet at the slot splice (``_install``)."""
        while True:
            try:
                req = self._queue.get(timeout=0.05)
            except queue_mod.Empty:
                if self._closing:
                    return
                continue
            # wait for a free slot: bounds prepared-scratch HBM to the
            # slot budget (the worker frees slots as requests retire).
            # Claim (free-scan + batch-grab + reserve) is atomic so
            # concurrent admitters never double-book a slot.
            while True:
                with self._admit_lock:
                    free = self._free_unreserved()
                    if free:
                        reqs = [req]
                        while len(reqs) < min(len(free), self.admit_batch):
                            try:
                                reqs.append(self._queue.get_nowait())
                            except queue_mod.Empty:
                                break
                        slots = free[: len(reqs)]
                        for s in slots:
                            self._reserved.add(s)
                        break
                time.sleep(0.002)
            with self.stats_lock:
                self._stats["requests"] += len(reqs)
            try:
                results = self._prepare(reqs)
            except BaseException as e:  # noqa: BLE001 — admitter must live
                results = [e] * len(reqs)
            for r, slot, res in zip(reqs, slots, results):
                if isinstance(res, BaseException):
                    self._deliver_error(r, res)
                    self._reserved.discard(slot)
                else:
                    self._ready.put((slot, res))

    def _prepare(self, reqs: List[_EngineRequest]) -> List[Any]:
        """Run the admission chain for a batch of requests. Same-shaped
        plain video requests share ONE encode/splice/prefill dispatch
        chain (each stage is row-independent, so outputs equal the solo
        path bit-for-bit); text/image/region requests prepare solo.
        Returns one ``_Prepared`` or exception per request."""
        model = self.model
        results: List[Any] = [None] * len(reqs)
        pend = []
        for i, req in enumerate(reqs):
            try:
                modal_token = {
                    "image": DEFAULT_IMAGE_TOKEN,
                    "video": DEFAULT_VIDEO_TOKEN,
                    "text": "",
                }[req.modal]
                ids = _assemble_input_ids(
                    req.sample["instruct"], req.choice, modal_token,
                    self.tokenizer,
                )
                if model.ids.seg in ids:
                    raise ValueError(
                        "engine mode is QA-only ([SEG] in prompt)"
                    )
                pend.append((i, ids))
            except Exception as e:  # noqa: BLE001 — delivered to caller
                results[i] = e
        groups: Dict[tuple, List[tuple]] = {}
        solo: List[tuple] = []
        for i, ids in pend:
            s = reqs[i].sample
            vid = s.get("video")
            if (
                reqs[i].modal == "video"
                and vid is not None
                and s.get("frame") is None
                and s.get("masks") is None
            ):
                # prestaged payloads are jax arrays already on device —
                # np.asarray on those would pull 28 MB back through the
                # tunnel, so key the group on the array as-is
                arr = vid if isinstance(vid, jax.Array) else np.asarray(vid)
                groups.setdefault(
                    (arr.shape, str(arr.dtype)), []
                ).append((i, ids, arr))
            else:
                solo.append((i, ids))
        for members in groups.values():
            self._prepare_video_group(reqs, members, results)
            for i, ids, _arr in members:
                if results[i] is None:  # sub-batch failed → solo retry
                    solo.append((i, ids))
        for i, ids in solo:
            try:
                results[i] = self._prepare_one(reqs[i], ids)
            except Exception as e:  # noqa: BLE001 — delivered to caller
                results[i] = e
        for res in results:
            if isinstance(res, _Prepared):
                # the encode consumed the pixels; drop the (possibly
                # device-resident) payload instead of holding ~28 MB per
                # slot until retirement
                res.req.sample.pop("video", None)
        return results

    def _stage_mark(self, name: str, arr, t_prev: float) -> float:
        """Stage fence for admission telemetry (UFVIDEO_ENGINE_STAGE_SYNC=1):
        a one-element readback forces the stage's dispatches to complete
        (block_until_ready is a no-op on remote runtimes) and the elapsed
        time lands in stats as ``stage_<name>_s``. Off by default — the
        fences serialize the chain they are measuring."""
        if not self._stage_sync:
            return t_prev
        np.asarray(jax.tree.leaves(arr)[0].ravel()[0])
        now = time.perf_counter()
        with self.stats_lock:
            key = f"stage_{name}_s"
            self._stats[key] = self._stats.get(key, 0.0) + (now - t_prev)
        return now

    @staticmethod
    def _pow2pad(items: list) -> list:
        """Pad a list to the next power-of-two length by repeating its
        last element. Every admission stage is row-independent, so dummy
        rows never perturb real rows — they exist purely to bound the
        compile-variant count (each distinct batch shape costs a multi-
        minute remote compile) to log2(max_slots) per stage."""
        n = len(items)
        target = 1 << max(n - 1, 0).bit_length()
        return items + [items[-1]] * (target - n)

    def _prepare_video_group(self, reqs, members, results) -> None:
        """Batched admission chain for same-shaped video requests, run in
        sub-batches of at most ``admit_chunk``: each sub-batch shares ONE
        host→device transfer, ONE vision encode, ONE splice, and one
        prefill per 256-length bucket. The cap bounds the chain's HBM
        transients (f32 pixel stack + T·chunk-frame vision activations +
        [chunk, max_seq_len, hidden] splice embeds + scratch prefill
        caches) — an uncapped 8-request group stages ~0.45 GB of pixels
        and a 256-frame SigLIP pass next to the live decode state, which
        OOMed on-chip (2026-08-19). Batch dims are padded to powers of two
        (see ``_pow2pad``)."""
        members = list(members)
        for start in range(0, len(members), self.admit_chunk):
            try:
                self._prepare_video_subgroup(
                    reqs, members[start : start + self.admit_chunk], results
                )
            except Exception:  # noqa: BLE001 — failed members retry solo
                pass  # their results stay None; _prepare solos them

    def _prepare_video_subgroup(self, reqs, members, results) -> None:
        model, cfg = self.model, self.model.cfg
        t_start = time.perf_counter()
        t_stage = t_start
        padded = self._pow2pad(list(members))
        vids = [arr for _, _, arr in padded]
        if any(isinstance(v, jax.Array) for v in vids):
            # prestaged payloads (see _prestage) are already bf16/uint8 on
            # device — the stack is one device op, no host memcpy
            px = jnp.stack([jnp.asarray(v) for v in vids])
        else:
            stack = np.stack(vids)  # [Gp, T, H, W, 3]
            if (
                stack.dtype == np.float32
                and cfg.compute_dtype == jnp.bfloat16
            ):
                # halve the host→device bytes: the vision tower computes in
                # bf16 anyway, so casting on host is encode-bit-identical
                # and the (high-RTT, ~50-100 MB/s) transfer is the admission
                # chain's largest single term at f32 (56 MB/request)
                import ml_dtypes

                stack = stack.astype(ml_dtypes.bfloat16)
            px = jnp.asarray(stack)
        t_stage = self._stage_mark("transfer", px, t_stage)
        if px.dtype == jnp.uint8:
            from .ops.image_pipeline import siglip_preprocess_device

            g, t = px.shape[:2]
            px = siglip_preprocess_device(
                px.reshape((g * t,) + px.shape[2:]),
                out_dtype=cfg.compute_dtype,
            )
            px = px.reshape((g, t) + px.shape[1:])
        feats = model.encode_video(px)  # [Gp, V, d]
        del px  # drop the device pixel ref as soon as the encode owns it
        t_stage = self._stage_mark("encode", feats, t_stage)
        plan = plan_splice(
            [ids for _, ids, _ in padded],
            num_video_tokens=feats.shape[1],
            region_token_counts=[[]] * len(padded),
            region_token_id=model.ids.region,
            max_seq_len=cfg.budget.max_seq_len,
            region_stride=cfg.region.region_token_num,
        )
        embeds = model._splice(
            model.params,
            jnp.asarray(plan.text_ids),
            jnp.asarray(plan.src_kind),
            jnp.asarray(plan.src_idx),
            feats,
            None,
        )  # [G, S, d]
        t_stage = self._stage_mark("splice", embeds, t_stage)
        del feats
        real_lens = [int(l) for l in plan.seq_lens]
        buckets: Dict[int, List[int]] = {}
        for j, rl in enumerate(real_lens):
            trim = min((rl + 255) // 256 * 256, cfg.budget.max_seq_len)
            buckets.setdefault(trim, []).append(j)
        lookup_rows = None
        if self.spec_k:
            from .splicing import plan_lookup_ids

            lookup_rows = plan_lookup_ids(plan)
        for trim, rows in buckets.items():
            prows = self._pow2pad(rows)
            emb = embeds[jnp.asarray(prows)][:, :trim]
            scratch, t0, _hid, _rng = prefill_start(
                model.model.llm,
                model.params["llm"],
                emb,
                jnp.asarray(
                    np.array([real_lens[j] for j in prows], np.int32)
                ),
                cache_max_len=trim,
                vocab_size=cfg.llm.vocab_size,
                kv_quant=bool(cfg.quant_kv),
                prefill_chunk=0,
            )
            t0h = np.asarray(t0)
            t_stage = self._stage_mark("prefill", t0, t_stage)
            for rj, j in enumerate(rows):
                if j >= len(members):
                    continue  # pow2-padding dummy row
                i, _ids, _ = members[j]
                results[i] = _Prepared(
                    reqs[i], scratch, rj, int(t0h[rj]), real_lens[j],
                    lookup_rows[j] if self.spec_k else None,
                )
        with self.stats_lock:
            self._stats["admit_batches"] += 1
            self._stats["admit_batched_requests"] += len(members)
            self._stats["prep_s"] += time.perf_counter() - t_start

    def _prepare_one(self, req: _EngineRequest, input_ids) -> _Prepared:
        """Solo admission chain (text/image/region requests, or the
        fallback when a batched group fails)."""
        t_start = time.perf_counter()
        model, cfg = self.model, self.model.cfg
        s = req.sample
        video_feats = _encode_video_input(model, s.get("video"), req.modal)
        region_feats, region_counts = None, None
        if s.get("frame") is not None and s.get("masks") is not None:
            region_feats, region_counts = model.pack_and_encode_regions(
                np.asarray(s["frame"]), np.asarray(s["masks"]),
                s.get("ann_indices"),
            )
        plan = plan_splice(
            [input_ids],
            num_video_tokens=(
                video_feats.shape[1] if video_feats is not None else 0
            ),
            region_token_counts=[region_counts or []],
            region_token_id=model.ids.region,
            max_seq_len=cfg.budget.max_seq_len,
            region_stride=cfg.region.region_token_num,
        )
        embeds = model._splice(
            model.params,
            jnp.asarray(plan.text_ids),
            jnp.asarray(plan.src_kind),
            jnp.asarray(plan.src_idx),
            video_feats,
            region_feats,
        )
        real_len = int(plan.seq_lens[0])
        trim = min((real_len + 255) // 256 * 256, cfg.budget.max_seq_len)
        scratch, t0, _hid, _rng = prefill_start(
            model.model.llm,
            model.params["llm"],
            embeds[:, :trim],
            jnp.asarray(plan.seq_lens),
            cache_max_len=trim,
            vocab_size=cfg.llm.vocab_size,
            kv_quant=bool(cfg.quant_kv),
            prefill_chunk=0,
        )
        lookup = None
        if self.spec_k:
            from .splicing import plan_lookup_ids

            lookup = plan_lookup_ids(plan)[0]
        prep = _Prepared(req, scratch, 0, int(t0[0]), real_len, lookup)
        with self.stats_lock:
            self._stats["prep_s"] += time.perf_counter() - t_start
        return prep

    # ---------------- worker ----------------

    def _install(self, slot: int, prep: _Prepared) -> None:
        """Splice a prepared request into its slot (the only admission
        work that touches the decode state — cheap and between chunks)."""
        t_start = time.perf_counter()
        cfg = self.model.cfg
        if self.spec_k:
            from .models.speculative import spec_slot_admit

            if self._spec_state is None:
                self._spec_state = self._init_spec_state()
            s_off = cfg.budget.max_seq_len
            row = np.full((s_off + self.max_new_cap,), -1, np.int32)
            row[:s_off] = prep.lookup_ids
            self._spec_state = spec_slot_admit(
                self._spec_state, slot, prep.scratch,
                jnp.asarray(prep.t0, jnp.int32),
                jnp.asarray(prep.real_len, jnp.int32), jnp.asarray(row),
                src=prep.src,
            )
        else:
            if self._cache is None:
                self._cache = make_kv_cache(
                    cfg.llm, self.max_slots, self.cache_positions,
                    dtype=cfg.compute_dtype, quant=bool(cfg.quant_kv),
                )
            self._cache = _copy_slot(self._cache, prep.scratch, slot,
                                     prep.src)
            self._cache_len[slot] = prep.real_len
            self._cur[slot] = prep.t0
        st = _SlotState(prep.req, self.tokenizer)
        self._slots[slot] = st  # occupy BEFORE releasing the reservation
        self._reserved.discard(slot)
        self._done[slot] = False
        self._forced_done[slot] = False
        with self.stats_lock:
            self._stats["admissions"] += 1
            self._stats["install_s"] += time.perf_counter() - t_start
        self._emit(slot, [prep.t0])

    def _init_spec_state(self):
        """Zeroed batch-shaped spec loop state (all slots idle == done)."""
        cfg = self.model.cfg
        b, cap = self.max_slots, self.max_new_cap
        s_off = cfg.budget.max_seq_len
        cache = make_kv_cache(
            cfg.llm, b, self.cache_positions,
            dtype=cfg.compute_dtype, quant=bool(cfg.quant_kv),
        )
        return (
            jnp.asarray(0, jnp.int32),
            jnp.zeros((b, cap), jnp.int32),
            jnp.zeros((b, cap, cfg.llm.hidden_size), cfg.compute_dtype),
            cache,
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b, s_off + cap), -1, jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
        )

    def _emit(self, slot: int, new_ids: List[int]) -> None:
        """Append tokens to a slot, stream the safe text delta, apply
        host-side stop rules (eos is in-chunk; stop_strings and the budget
        here)."""
        st = self._slots[slot]
        take = min(len(new_ids), st.max_new - st.n_tokens)
        taken = new_ids[:take]
        st.n_tokens += take
        eos_hit = self.model.ids.eos in taken
        delta, stopped = st.streamer.push(taken)
        if st.req.stream:
            if st.req.future.cancelled:
                self._retire(slot)
                return
            if delta:
                st.req.future.push(delta)
        if stopped or eos_hit or st.n_tokens >= st.max_new:
            self._retire(slot)

    def _retire(self, slot: int) -> None:
        st = self._slots[slot]
        st.finished = True
        try:
            final = st.streamer.finish()  # flush the held tail
            if st.req.stream:
                if final and not st.req.future.cancelled:
                    st.req.future.push(final)
                st.req.future.finish()
            else:
                st.req.future.set_result(
                    (st.streamer.text().strip(),
                     {"output": st.streamer.ids, "pred_masks": []})
                )
        finally:
            with self.stats_lock:
                self._stats["completed"] += 1
                if self._slot_spec_counts is not None:
                    self._stats["spec_drafted"] += int(
                        self._slot_spec_counts[0][slot]
                    )
                    self._stats["spec_accepted"] += int(
                        self._slot_spec_counts[1][slot]
                    )
                    self._slot_spec_counts[0][slot] = 0
                    self._slot_spec_counts[1][slot] = 0
                self._lat.append(time.perf_counter() - st.req.t_enqueue)
                if len(self._lat) > 2048:
                    del self._lat[:1024]
            self._slots[slot] = None
            self._done[slot] = True
            # spec mode: the device-side done flag must follow, or the slot
            # keeps burning verify work (and cache positions) until readmit
            self._forced_done[slot] = True

    def _step(self) -> None:
        """One decode dispatch over every active slot: a ``chunk``-step
        decode_chunk in plain mode, or one draft→verify spec iteration
        (1..K+1 tokens per slot) in spec mode."""
        t_start = time.perf_counter()
        cfg = self.model.cfg
        if self.spec_k:
            from .models.speculative import _spec_step_jit, spec_set_done

            if self._forced_done.any():
                self._spec_state = spec_set_done(
                    self._spec_state, jnp.asarray(self._forced_done)
                )
                self._forced_done[:] = False
            self._spec_state = _spec_step_jit(
                self.model.model.llm,
                self.model.params["llm"],
                self._spec_state,
                k=self.spec_k,
                stop_ids=(self.model.ids.eos,),
                vocab_size=cfg.llm.vocab_size,
                max_new_tokens=self.max_new_cap,
                prompt_len=cfg.budget.max_seq_len,
            )
            tokens = np.asarray(self._spec_state[1])
            gen_lens = np.asarray(self._spec_state[7])
            self._done = np.array(self._spec_state[6])
            self._slot_spec_counts = (
                np.array(self._spec_state[9]), np.array(self._spec_state[10])
            )
            with self.stats_lock:
                self._stats["chunks"] += 1
            for slot, st in enumerate(self._slots):
                if st is None:
                    continue
                new = int(gen_lens[slot])
                prev = st.n_tokens
                if new > prev:
                    self._emit(slot, tokens[slot, prev:new].tolist())
                if self._slots[slot] is not None and self._done[slot]:
                    self._retire(slot)
            with self.stats_lock:
                self._stats["step_s"] += time.perf_counter() - t_start
            return
        tokens, n, _hiddens, self._cache, cache_len, cur, done, _rng = (
            decode_chunk(
                self.model.model.llm,
                self.model.params["llm"],
                self._cache,
                jnp.asarray(self._cache_len),
                jnp.asarray(self._cur),
                jnp.asarray(self._done),
                chunk=self.chunk,
                stop_ids=(self.model.ids.eos,),
                vocab_size=cfg.llm.vocab_size,
            )
        )
        tokens = np.asarray(tokens)
        n = np.asarray(n)
        # np.array (copy): np.asarray of a jax array is a READ-ONLY view,
        # and slot bookkeeping mutates these in place
        self._cache_len = np.array(cache_len)
        self._cur = np.array(cur)
        self._done = np.array(done)
        with self.stats_lock:
            self._stats["chunks"] += 1
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            k = int(n[slot])
            if k:
                self._emit(slot, tokens[slot, :k].tolist())
            if self._slots[slot] is not None and self._done[slot]:
                # eos landed in-chunk but _emit kept the slot (no budget /
                # stop-string hit) — retire on the device's verdict
                self._retire(slot)
        with self.stats_lock:
            self._stats["step_s"] += time.perf_counter() - t_start

    def _run(self) -> None:
        while True:
            # splice prepared admissions into their slots between chunks
            installed = False
            while True:
                try:
                    slot, prep = self._ready.get_nowait()
                except queue_mod.Empty:
                    break
                try:
                    self._install(slot, prep)
                    installed = True
                except Exception as e:  # noqa: BLE001 — delivered to caller
                    self._deliver_error(prep.req, e)
                    self._reserved.discard(slot)

            active = any(s is not None for s in self._slots)
            if not active:
                # drain-on-close: exit only after the admitter has drained
                # the queue and retired (it exits on closing+empty), with
                # nothing left to splice
                if (
                    self._closing
                    and not any(t.is_alive() for t in self._admitters)
                    and self._ready.empty()
                ):
                    return
                if not installed:
                    time.sleep(0.002)
                continue
            try:
                self._step()
            except Exception as e:  # noqa: BLE001 — delivered to callers
                # a failed decode dispatch must not kill the worker (which
                # would hang every active and queued request forever): fail
                # the in-flight requests, reset the device state (free-slot
                # rows are rebuilt on the next admission), keep serving
                self._fail_active(e)

    def _fail_active(self, exc: BaseException) -> None:
        with self.stats_lock:
            self._stats["errors"] += sum(
                s is not None for s in self._slots
            )
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            try:
                if st.req.stream:
                    st.req.future.finish(exc)
                else:
                    st.req.future.set_exception(exc)
            finally:
                self._slots[slot] = None
        self._done[:] = True
        self._forced_done[:] = False
        self._cache = None
        self._spec_state = None
        self._slot_spec_counts = None
