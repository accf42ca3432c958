"""Serving layer: batching scheduler semantics (stubbed inference) + HTTP
front end + real tiny-runtime parity (slow)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import ufvideo_tpu.serve as serve_mod
from ufvideo_tpu.serve import BatchingScheduler, np_to_b64, serve_http


class _Recorder:
    """Stands in for mm_infer_batch: records call batch compositions and
    returns per-sample results derived from the instruct string."""

    def __init__(self, fail_instructs=(), latency_s=0.0):
        self.calls = []
        self.fail_instructs = set(fail_instructs)
        self.latency_s = latency_s
        self.lock = threading.Lock()

    def __call__(self, samples, model, tokenizer, modal="video", choice=1,
                 **kwargs):
        with self.lock:
            self.calls.append(
                [s["instruct"] for s in samples]
            )
        if self.latency_s:
            time.sleep(self.latency_s)
        for s in samples:
            if s["instruct"] in self.fail_instructs:
                raise RuntimeError(f"poisoned: {s['instruct']}")
        return [
            (f"echo:{s['instruct']}:mnt{kwargs.get('max_new_tokens', 1024)}",
             {"output": [1, 2], "pred_masks": []})
            for s in samples
        ]


@pytest.fixture
def stub(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(serve_mod, "mm_infer_batch", rec)
    return rec


def _sched(**kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_wait_ms", 80)
    return BatchingScheduler(model=None, tokenizer=None, **kw)


def _sample(name, t=4):
    return {"video": np.zeros((t, 8, 8, 3), np.float32), "instruct": name}


def test_requests_coalesce_into_one_batch(stub):
    with _sched() as s:
        futs = [s.submit(_sample(f"q{i}"), max_new_tokens=8) for i in range(3)]
        out = [f.result(timeout=10) for f in futs]
    assert [t for t, _ in out] == [f"echo:q{i}:mnt8" for i in range(3)]
    # all three rode one dispatch (submitted within the batching window)
    assert stub.calls == [["q0", "q1", "q2"]]
    st = s.stats()
    assert st["batches"] == 1 and st["mean_batch_size"] == 3.0


def test_single_request_flushes_after_window(stub):
    with _sched(max_wait_ms=30) as s:
        t0 = time.perf_counter()
        fut = s.submit(_sample("solo"), max_new_tokens=8)
        fut.result(timeout=10)
        dt = time.perf_counter() - t0
    assert stub.calls == [["solo"]]
    assert dt < 5.0  # window, not the 10 s future timeout


def test_full_batch_dispatches_without_waiting(stub):
    """max_batch compatible requests skip the rest of the window."""
    with _sched(max_batch=2, max_wait_ms=10_000) as s:
        futs = [s.submit(_sample(f"q{i}"), max_new_tokens=8) for i in range(2)]
        for f in futs:
            f.result(timeout=10)
    assert stub.calls == [["q0", "q1"]]


def test_incompatible_requests_split_batches(stub):
    """Different max_new_tokens (a compile key) never share a dispatch;
    different frame counts never share a stacked batch."""
    with _sched() as s:
        f1 = s.submit(_sample("a"), max_new_tokens=8)
        f2 = s.submit(_sample("b"), max_new_tokens=16)
        f3 = s.submit(_sample("c", t=8), max_new_tokens=8)
        for f in (f1, f2, f3):
            f.result(timeout=10)
    assert sorted(map(tuple, stub.calls)) == [("a",), ("b",), ("c",)]


def test_oversize_group_splits_at_max_batch(stub):
    with _sched(max_batch=2, max_wait_ms=200) as s:
        futs = [s.submit(_sample(f"q{i}"), max_new_tokens=8) for i in range(5)]
        for f in futs:
            f.result(timeout=10)
    sizes = sorted(len(c) for c in stub.calls)
    assert sizes == [1, 2, 2]
    assert sum(stub.calls, []) == [f"q{i}" for i in range(5)]  # FIFO


def test_poisoned_request_falls_back_per_sample(monkeypatch):
    rec = _Recorder(fail_instructs={"bad"})
    monkeypatch.setattr(serve_mod, "mm_infer_batch", rec)
    with _sched() as s:
        good = s.submit(_sample("good"), max_new_tokens=8)
        bad = s.submit(_sample("bad"), max_new_tokens=8)
        assert good.result(timeout=10)[0] == "echo:good:mnt8"
        with pytest.raises(RuntimeError, match="poisoned"):
            bad.result(timeout=10)
    st = s.stats()
    assert st["fallback_samples"] == 1 and st["errors"] == 1
    # batch attempt, then two per-sample retries
    assert [len(c) for c in rec.calls] == [2, 1, 1]


def test_close_drains_pending_then_rejects(stub):
    s = _sched(max_wait_ms=5_000)
    fut = s.submit(_sample("last"), max_new_tokens=8)
    s.close()  # must flush the window early and run the pending request
    assert fut.result(timeout=1)[0] == "echo:last:mnt8"
    with pytest.raises(RuntimeError, match="closed"):
        s.submit(_sample("late"))


def test_greedy_ignores_seed_in_batch_key(stub):
    """Greedy requests with different seeds share a batch; sampling ones
    do not."""
    with _sched() as s:
        f1 = s.submit(_sample("g1"), max_new_tokens=8, seed=0)
        f2 = s.submit(_sample("g2"), max_new_tokens=8, seed=7)
        for f in (f1, f2):
            f.result(timeout=10)
        assert stub.calls == [["g1", "g2"]]
        f3 = s.submit(_sample("s1"), max_new_tokens=8, do_sample=True, seed=0)
        f4 = s.submit(_sample("s2"), max_new_tokens=8, do_sample=True, seed=7)
        for f in (f3, f4):
            f.result(timeout=10)
    assert sorted(map(tuple, stub.calls[1:])) == [("s1",), ("s2",)]


def test_http_round_trip(stub, monkeypatch):
    class _Cfg:
        class budget:
            num_frames = 4

        class vision:
            image_size = 8

    class _Model:
        cfg = _Cfg()

    with _sched() as s:
        s.model = _Model()
        server = serve_http(s, host="127.0.0.1", port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            body = {
                "instruct": "hello",
                "video_b64": np_to_b64(np.zeros((4, 8, 8, 3), np.float32)),
                "max_new_tokens": 8,
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/generate",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                out = json.loads(r.read())
            assert out["text"] == "echo:hello:mnt8"
            assert out["tokens"] == [1, 2]
            assert out["pred_masks_rle"] == []

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/stats", timeout=10
            ) as r:
                st = json.loads(r.read())
            assert st["requests"] == 1

            # malformed request → 400, not a crashed handler
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/generate",
                data=json.dumps({"instruct": "x"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=10)
            assert ei.value.code == 400
        finally:
            server.shutdown()
            server.server_close()


def _stub_stream(deltas, fail_after=None):
    def fake(video, instruct, model, tokenizer, modal="video", choice=1,
             masks=None, ann_indices=None, frame=None, chunk=16, **kw):
        for i, d in enumerate(deltas):
            if fail_after is not None and i == fail_after:
                raise RuntimeError("stream blew up")
            yield d
    return fake


def test_submit_stream_yields_deltas(stub, monkeypatch):
    monkeypatch.setattr(serve_mod, "mm_infer_stream",
                        _stub_stream(["Hello ", "world"]))
    with _sched() as s:
        fut = s.submit_stream(_sample("q"), max_new_tokens=8, chunk=4)
        assert list(fut) == ["Hello ", "world"]
        # a plain request still round-trips alongside streams
        plain = s.submit(_sample("p"), max_new_tokens=8)
        assert plain.result(timeout=10)[0] == "echo:p:mnt8"
    st = s.stats()
    assert st["streamed"] == 1 and st["requests"] == 2


def test_stream_error_raises_at_consumer(stub, monkeypatch):
    monkeypatch.setattr(serve_mod, "mm_infer_stream",
                        _stub_stream(["a", "b"], fail_after=1))
    with _sched() as s:
        fut = s.submit_stream(_sample("q"))
        got = []
        with pytest.raises(RuntimeError, match="blew up"):
            for d in fut:
                got.append(d)
        assert got == ["a"]
    assert s.stats()["errors"] == 1


def test_http_streaming(stub, monkeypatch):
    monkeypatch.setattr(serve_mod, "mm_infer_stream",
                        _stub_stream(["He", "llo"]))

    class _Cfg:
        class budget:
            num_frames = 4

        class vision:
            image_size = 8

    class _Model:
        cfg = _Cfg()

    with _sched() as s:
        s.model = _Model()
        server = serve_http(s, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            body = {
                "instruct": "hi",
                "video_b64": np_to_b64(np.zeros((4, 8, 8, 3), np.float32)),
                "stream": True, "chunk": 2,
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/generate",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.headers["Content-Type"] == "text/event-stream"
                events = [
                    json.loads(line[len(b"data: "):])
                    for line in r.read().split(b"\n\n")
                    if line.startswith(b"data: ")
                ]
            assert events[:-1] == [{"delta": "He"}, {"delta": "llo"}]
            assert events[-1] == {"done": True}
        finally:
            server.shutdown()
            server.server_close()


def test_stream_cancel_stops_producer(stub, monkeypatch):
    produced = []

    def fake(video, instruct, model, tokenizer, **kw):
        for i in range(100):
            produced.append(i)
            yield f"d{i}"
            time.sleep(0.02)

    monkeypatch.setattr(serve_mod, "mm_infer_stream", fake)
    with _sched() as s:
        fut = s.submit_stream(_sample("q"))
        it = iter(fut)
        next(it)  # first delta arrived
        fut.cancel()
    # worker drained at close; cancellation cut the 100-delta stream short
    assert len(produced) < 100


def test_latency_percentiles_in_stats(stub):
    with _sched() as s:
        s.submit(_sample("q"), max_new_tokens=8).result(timeout=10)
        st = s.stats()
    assert st["latency_s"]["p50"] >= 0.0
    assert st["latency_s"]["p95"] >= st["latency_s"]["p50"]


def test_mask_rle_round_trips_through_encoding():
    from ufvideo_tpu import rle
    from ufvideo_tpu.serve import _encode_result

    masks = (np.random.RandomState(0).rand(1, 2, 6, 5) > 0.5)
    enc = _encode_result(("t", {"output": [3], "pred_masks": list(masks)}))
    dec = np.stack([
        np.stack([rle.decode(f) for f in obj])
        for obj in enc["pred_masks_rle"]
    ]).astype(bool)
    assert (dec == masks).all()


@pytest.mark.slow
def test_scheduler_matches_mm_infer_on_tiny_runtime():
    """Real model: concurrent scheduler submissions == direct mm_infer."""
    from ufvideo_tpu.api import mm_infer, model_init
    from ufvideo_tpu.configs import tiny_config

    model, _, tok = model_init(None, cfg=tiny_config())
    cfg = model.cfg
    rng = np.random.RandomState(0)
    t, img = cfg.budget.num_frames, cfg.vision.image_size
    videos = [rng.randn(t, img, img, 3).astype(np.float32) for _ in range(3)]
    prompts = [f"What happens in scene {i}?" for i in range(3)]

    with BatchingScheduler(model, tok, max_batch=4, max_wait_ms=200) as s:
        futs = [
            s.submit({"video": v, "instruct": p}, max_new_tokens=5)
            for v, p in zip(videos, prompts)
        ]
        got = [f.result(timeout=600) for f in futs]
        st = s.stats()
    assert st["batches"] == 1 and st["batched_samples"] == 3

    for (text, out), v, p in zip(got, videos, prompts):
        ref_text, ref_out = mm_infer(v, p, model, tok, max_new_tokens=5)
        assert text == ref_text
        assert list(out["output"]) == list(ref_out["output"])
