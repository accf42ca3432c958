"""On-chip eval-harness smoke: drive eval/run.py end-to-end on the REAL
backend (TPU unless --platform cpu) with the tiny random-init model and
synthetic videos — one QA benchmark (mvbench) + one seg benchmark (mevis) —
then feed the per-rank outputs to the scorers. Asserts integration (driver →
JSONL/PNG protocol → scorer ingestion) against the real runtime once per
round; model QUALITY is asserted elsewhere (torch-oracle tests). The CPU
version of this chain runs in tests/test_eval_roundtrip.py; this script
exists because integration rot on the real backend was otherwise only
caught by hand (reference chain analog: scripts/eval/eval_video_PixRQA.sh).

    python scripts/eval_smoke.py                 # real chip
    python scripts/eval_smoke.py --platform cpu  # plumbing-only

Prints ONE JSON line {"eval_smoke": "ok", ...} on success.
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIDEOS = 2
N_RAW_FRAMES = 6
H = W = 64


def make_data(root: str):
    import cv2
    import numpy as np

    from ufvideo_tpu import rle

    vids = os.path.join(root, "videos")
    rng = np.random.default_rng(0)
    for v in range(N_VIDEOS):
        d = os.path.join(vids, f"vid{v}")
        os.makedirs(d)
        for f in range(N_RAW_FRAMES):
            cv2.imwrite(
                os.path.join(d, f"{f:03d}.png"),
                rng.integers(0, 255, (H, W, 3), np.uint8),
            )
    # mvbench-style MCQA (eval/datasets.py MCQABenchmark schema)
    mcqa = [
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
    with open(os.path.join(root, "mcqa.json"), "w") as f:
        json.dump(mcqa, f)

    # mevis-style seg questions ([SEG] in the conversation → path B) + GT
    mevis = [
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
    with open(os.path.join(root, "mevis.json"), "w") as f:
        json.dump(mevis, f)
    m = np.zeros((H, W), np.uint8)
    m[16:40, 8:32] = 1
    gt = [
        {"id": f"m{v}", "annotation": [rle.encode(m)] * 2}
        for v in range(N_VIDEOS)
    ]
    with open(os.path.join(root, "mevis_gt.json"), "w") as f:
        json.dump(gt, f)
    return vids


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default="", choices=["", "cpu", "tpu"])
    args = p.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ufvideo_tpu.utils import maybe_enable_compile_cache

    maybe_enable_compile_cache()

    from ufvideo_tpu.api import model_init
    from ufvideo_tpu.configs import tiny_config
    from ufvideo_tpu.eval.run import build_parser, run_benchmark
    from ufvideo_tpu.eval import score_mcqa, score_seg
    from ufvideo_tpu.eval.util import read_all_ranks

    cfg = tiny_config()
    cfg = cfg.replace(
        budget=dataclasses.replace(cfg.budget, max_seq_len=512, max_text_len=384)
    )
    bundle = model_init(None, cfg=cfg)
    out = {}

    with tempfile.TemporaryDirectory() as root:
        vids = make_data(root)

        # QA benchmark (reference: inference_video_mcqa_mvbench.py)
        mv_out = os.path.join(root, "mv_out.json")
        run_benchmark(
            build_parser().parse_args([
                "--benchmark", "mvbench",
                "--video-folder", vids,
                "--question-file", os.path.join(root, "mcqa.json"),
                "--output", mv_out,
                "--num-frames", "4",
                "--max-new-tokens", "4",
            ]),
            runtime=bundle,
        )
        records = read_all_ranks(mv_out)
        assert len(records) == N_VIDEOS, records
        assert all({"id", "pred", "gt", "task_type"} <= set(r) for r in records)
        sys.argv = ["score_mcqa", "--pred-path", mv_out]
        score_mcqa.main()
        out["mvbench_records"] = len(records)

        # seg benchmark (reference: inference_video_Seg_MeVis.py)
        me_out = os.path.join(root, "me_out.json")
        run_benchmark(
            build_parser().parse_args([
                "--benchmark", "mevis",
                "--video-folder", vids,
                "--question-file", os.path.join(root, "mevis.json"),
                "--output", me_out,
                "--num-frames", "4",
                "--num-sam-frames", "2",
                "--max-new-tokens", "4",
            ]),
            runtime=bundle,
        )
        records = read_all_ranks(me_out)
        assert len(records) == N_VIDEOS, records
        mask_root = os.path.splitext(me_out)[0] + "_masks"
        assert sorted(os.listdir(mask_root)) == [
            f"m{v}" for v in range(N_VIDEOS)
        ]
        sys.argv = [
            "score_seg", "--pred-path", me_out, "--pred-mask-root", mask_root,
            "--gt", "rle", "--gt-file", os.path.join(root, "mevis_gt.json"),
        ]
        score_seg.main()
        out["mevis_records"] = len(records)

    import jax

    out["platform"] = jax.default_backend()
    out["eval_smoke"] = "ok"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
