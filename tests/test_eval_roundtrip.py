"""End-to-end eval round-trip: driver → per-rank JSONL + PNG dumps → scorer,
for every benchmark, across 2 simulated ranks (reference protocol:
inference_PixRQA.py:214,268-283; scorers glob *_rank*.json).

Uses the tiny random-init model and synthetic frame-directory videos, so
this asserts the plumbing (chunking, file protocol, mask shapes, id joins,
score computation) rather than model quality.
"""

import argparse
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded by -m 'not slow'

from ufvideo_tpu import rle
from ufvideo_tpu.api import model_init
from ufvideo_tpu.configs import tiny_config
from ufvideo_tpu.eval.run import build_parser, run_benchmark
from ufvideo_tpu.eval import score_mcqa, score_seg, score_tvg
from ufvideo_tpu.eval.util import read_all_ranks

N_VIDEOS = 3
N_RAW_FRAMES = 6
H = W = 64


@pytest.fixture(scope="module")
def runtime():
    import dataclasses

    # the byte-level tokenizer spends ~1 token/char, so the real benchmark
    # questions (e.g. the fixed PixRQA prompt) need a larger text budget
    # than the default tiny config carries
    cfg = tiny_config()
    cfg = cfg.replace(budget=dataclasses.replace(
        cfg.budget, max_seq_len=512, max_text_len=384))
    return model_init(None, cfg=cfg)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    """Synthetic videos (frame-PNG directories) + per-benchmark question
    files + gt annotations."""
    import cv2

    root = tmp_path_factory.mktemp("evaldata")
    vids = root / "videos"
    rng = np.random.default_rng(0)
    gt_masks = {}
    for v in range(N_VIDEOS):
        d = vids / f"vid{v}"
        d.mkdir(parents=True)
        for f in range(N_RAW_FRAMES):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(str(d / f"{f:03d}.png"), img)
        m = np.zeros((H, W), np.uint8)
        m[10 + v : 30 + v, 12 : 40] = 1
        gt_masks[f"vid{v}"] = m

    def region_ann(v):
        # one region annotated on two frames (multi) with frame_idx for
        # single-mode filtering
        m = gt_masks[f"vid{v}"]
        seg = rle.encode(m)
        return [{"1": {"segmentation": seg}, "3": {"segmentation": seg}}]

    seg_questions = [
        {
            "id": f"s{v}",
            "video": f"vid{v}",
            "annotation": region_ann(v),
            "frame_idx": 1,
            "caption": f"object in video {v}",
            "conversations": [[{"from": "human", "value": "Describe <region>."}]],
        }
        for v in range(N_VIDEOS)
    ]
    (root / "seg.json").write_text(json.dumps(seg_questions))

    # pixhqa/pixtrqa reference schema (inference_PixHQA.py:88-120):
    # frame_idx is a LIST, the question+caption ride in conversations
    hqa_questions = [
        {
            "id": f"s{v}",
            "video": f"vid{v}",
            "annotation": region_ann(v),
            "frame_idx": [1, 3],
            # real PixTRQA captions carry <TEMP-xxx> spans (no dots
            # before the sentence end), so the reference's naive
            # split('.', 1) isolates the temporal sentence cleanly
            "caption": f"at {{<TEMP-010>, <TEMP-060>}}. object in video {v}",
            "conversations": [[
                {"from": "human", "value": "<video>\nDescribe the scene."},
                {"from": "gpt",
                 "value": f"at {{<TEMP-010>, <TEMP-060>}}. object {v}"},
            ]],
        }
        for v in range(N_VIDEOS)
    ]
    (root / "hqa.json").write_text(json.dumps(hqa_questions))

    # videorefer_q reference schema (inference_videorefer_q_bench.py:88-97)
    q_questions = [
        {
            "id": f"s{v}",
            "video": f"vid{v}",
            "annotation": region_ann(v),
            "frame_idx": 1,
            "Question": "What is the object <region> doing?",
            "options": ["(A) running", "(B) sitting", "(C) flying"],
            "Answer": "(B) sitting",
            "type": "Basic Questions",
        }
        for v in range(N_VIDEOS)
    ]
    (root / "q.json").write_text(json.dumps(q_questions))

    mevis_questions = [
        {
            "id": f"m{v}",
            "video": f"vid{v}",
            "conversations": [
                {"from": "human", "value": "<video>\nSegment the moving object."},
                {"from": "gpt", "value": "Sure, it is [SEG]."},
            ],
        }
        for v in range(N_VIDEOS)
    ]
    (root / "mevis.json").write_text(json.dumps(mevis_questions))
    # scorer-side gt: per-id list of per-frame RLEs (frame count = SAM frames)
    mevis_gt = [
        {"id": f"m{v}", "annotation": [rle.encode(gt_masks[f"vid{v}"])] * 4}
        for v in range(N_VIDEOS)
    ]
    (root / "mevis_gt.json").write_text(json.dumps(mevis_gt))

    mcqa_questions = [
        {
            "id": f"q{v}",
            "task_type": "action",
            "data": {
                "video": f"vid{v}",
                "question": "What color dominates?",
                "candidates": ["red", "green"],
                "answer": "red",
            },
        }
        for v in range(N_VIDEOS)
    ]
    (root / "mcqa.json").write_text(json.dumps(mcqa_questions))

    tvg_questions = [
        {"id": f"t{v}", "video": f"vid{v}", "query": "a thing happens",
         "timestamps": [0.2, 0.6]}
        for v in range(N_VIDEOS)
    ]
    (root / "tvg.json").write_text(json.dumps(tvg_questions))

    return root


def _drive(bench, qfile, data, runtime, tmp, monkeypatch, **extra):
    out = str(tmp / f"{bench}.json")
    argv = [
        "--benchmark", bench,
        "--video-folder", str(data / "videos"),
        "--question-file", str(data / qfile),
        "--output", out,
        "--num-chunks", "2",
        "--num-frames", "4",
        "--num-sam-frames", "4",
        "--max-new-tokens", "4",
    ]
    for k, v in extra.items():
        argv += [k, v]
    args = build_parser().parse_args(argv)
    for rank in range(2):
        monkeypatch.setenv("RANK", str(rank))
        monkeypatch.setenv("WORLD_SIZE", "2")
        run_benchmark(args, runtime=runtime)
    records = read_all_ranks(out)
    assert len(records) == N_VIDEOS, (bench, records)
    return out, records


@pytest.mark.parametrize(
    "bench,qfile",
    [("pixrqa", "seg.json"), ("pixhqa", "hqa.json"),
     ("videorefer_q", "q.json")],
)
def test_seg_refer_benchmarks(bench, qfile, data, runtime, tmp_path,
                              monkeypatch):
    _, records = _drive(bench, qfile, data, runtime, tmp_path, monkeypatch)
    for r in records:
        assert r["id"].startswith("s")
        assert "pred" in r and "caption" in r
        if bench == "videorefer_q":
            # the q-bench scorer reads Answer/type off the record
            assert r["Answer"] == "(B) sitting"
            assert r["type"] == "Basic Questions"


@pytest.mark.parametrize("mode", ["single", "multi"])
def test_videorefer_d(mode, data, runtime, tmp_path, monkeypatch):
    _, records = _drive("videorefer_d", "seg.json", data, runtime, tmp_path,
                        monkeypatch, **{"--mode": mode})
    assert all("pred" in r for r in records)


def test_pixtrqa_span_records(data, runtime, tmp_path, monkeypatch):
    _, records = _drive("pixtrqa", "hqa.json", data, runtime, tmp_path,
                        monkeypatch)
    for r in records:
        assert "span" in r  # parsed (possibly None) span is always recorded
        # the leading temporal sentence is split off the judged caption
        # (inference_PixTRQA.py:290-291)
        assert r["caption"].strip().startswith("object in video")


def test_mevis_to_seg_scorer(data, runtime, tmp_path, monkeypatch, capsys):
    out, records = _drive("mevis", "mevis.json", data, runtime, tmp_path,
                          monkeypatch)
    mask_root = os.path.splitext(out)[0] + "_masks"
    # [SEG] was in the input conversation (path B) → masks must exist
    dumped = sorted(os.listdir(mask_root))
    assert dumped == [f"m{v}" for v in range(N_VIDEOS)]
    n_png = len(os.listdir(os.path.join(mask_root, "m0")))
    assert n_png == 4  # one per SAM frame

    monkeypatch.setattr(
        "sys.argv",
        ["score_seg", "--pred-path", out, "--pred-mask-root", mask_root,
         "--gt", "rle", "--gt-file", str(data / "mevis_gt.json")],
    )
    score_seg.main()
    printed = capsys.readouterr().out
    assert "J&F:" in printed and "J (region):" in printed


def test_mvbench_to_mcqa_scorer(data, runtime, tmp_path, monkeypatch, capsys):
    out, records = _drive("mvbench", "mcqa.json", data, runtime, tmp_path,
                          monkeypatch)
    for r in records:
        assert set(r) >= {"id", "pred", "gt", "task_type"}
    monkeypatch.setattr("sys.argv", ["score_mcqa", "--pred-path", out])
    score_mcqa.main()
    assert "overall accuracy:" in capsys.readouterr().out


def test_tvg_to_scorer(data, runtime, tmp_path, monkeypatch, capsys):
    out, records = _drive("tvg", "tvg.json", data, runtime, tmp_path,
                          monkeypatch)
    durations = {f"vid{v}": 10.0 for v in range(N_VIDEOS)}
    dpath = tmp_path / "durations.json"
    dpath.write_text(json.dumps(durations))
    monkeypatch.setattr(
        "sys.argv",
        ["score_tvg", "--pred-path", out, "--durations", str(dpath)],
    )
    score_tvg.main()
    printed = capsys.readouterr().out
    assert "mIoU:" in printed and "R@1(0.5):" in printed


def test_judge_description_with_stub_client(tmp_path):
    from ufvideo_tpu.eval import judge_description as jd

    class _Msg:
        # the reference-format judge reply (system.txt OUTPUT FORMAT)
        content = ("1. Subject Correspondence: 4\nExplanation: a\n"
                   "2. Appearance Description: 3\nExplanation: b\n"
                   "3. Temporal Description: 5\nExplanation: c\n"
                   "4. Hallucination Detection: 2\nExplanation: d")

    class _Choice:
        message = _Msg()

    class _Resp:
        choices = [_Choice()]

    class _Completions:
        @staticmethod
        def create(**kw):
            # reference user format (1.eval_gpt_new.py:16-17); default
            # sampling params (no temperature pin)
            assert "temperature" not in kw
            user = kw["messages"][1]["content"]
            assert user.startswith("##Correct answer: ")
            assert "##Predicted answer: " in user
            return _Resp()

    class _Chat:
        completions = _Completions()

    class _Client:
        chat = _Chat()

    verdict = jd.judge_one(_Client(), "gpt-4o", "a dog", "a brown dog")
    scores = jd.extract_scores(verdict)
    assert scores == {
        "Subject Correspondence": 4.0,
        "Appearance Description": 3.0,
        "Temporal Description": 5.0,
        "Hallucination Detection": 2.0,
    }

    judged = tmp_path / "judged.json"
    json.dump([{"id": 1, "pred": "x", "judge": verdict}], open(judged, "w"))
    extracted = tmp_path / "scores.json"
    jd.cmd_extract(argparse.Namespace(**{"in": str(judged), "out": str(extracted)}))
    jd.cmd_analyze(argparse.Namespace(**{"in": str(extracted)}))
    rows = json.load(open(extracted))
    assert rows and rows[0]["Temporal Description"] == 5.0


def test_mvbench_batched_matches_bs1(data, runtime, tmp_path, monkeypatch):
    """--batch 2 produces the same records as the reference-style bs=1
    loop (batched dispatch is a pure serving optimization)."""
    _, ref = _drive("mvbench", "mcqa.json", data, runtime, tmp_path / "a",
                    monkeypatch)
    _, bat = _drive("mvbench", "mcqa.json", data, runtime, tmp_path / "b",
                    monkeypatch, **{"--batch": "2"})
    key = lambda r: r["id"]
    for a, b in zip(sorted(ref, key=key), sorted(bat, key=key)):
        assert a == b, (a, b)


def test_pixrqa_batched_matches_bs1(data, runtime, tmp_path, monkeypatch):
    """Seg/refer --batch 2 (regions + path-A masks) matches the bs=1 loop."""
    out_a, ref = _drive("pixrqa", "seg.json", data, runtime, tmp_path / "a",
                        monkeypatch)
    out_b, bat = _drive("pixrqa", "seg.json", data, runtime, tmp_path / "b",
                        monkeypatch, **{"--batch": "2"})
    key = lambda r: r["id"]
    ref, bat = sorted(ref, key=key), sorted(bat, key=key)
    for a, b in zip(ref, bat):
        assert a == b, (a, b)
    # whatever mask dumps the bs=1 run produced (the tiny random model may
    # never emit [SEG] in 4 tokens), the batched run must mirror them
    import cv2

    ra = os.path.splitext(out_a)[0] + "_masks"
    rb = os.path.splitext(out_b)[0] + "_masks"
    la = sorted(os.listdir(ra)) if os.path.isdir(ra) else []
    lb = sorted(os.listdir(rb)) if os.path.isdir(rb) else []
    assert la == lb, (la, lb)
    for vid in la:
        for png in sorted(os.listdir(os.path.join(ra, vid))):
            ma = cv2.imread(os.path.join(ra, vid, png), 0)
            mb = cv2.imread(os.path.join(rb, vid, png), 0)
            assert ma is not None and mb is not None
            assert (ma == mb).mean() > 0.99
