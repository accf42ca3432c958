"""LLM-as-judge pipeline for description quality (VideoRefer-Bench-D).

Reference: eval/videorefer_bench_d/{1.eval_gpt_new.py, 2.extract_re.py,
3.analyze_score.py} — GPT judging with a 4-dimension rubric, regex score
extraction, per-dimension means. Collapsed into one module with three
subcommands:

    python -m ufvideo_tpu.eval.judge_description judge   --pred-path ... --out scored.json
    python -m ufvideo_tpu.eval.judge_description extract --in scored.json --out scores.json
    python -m ufvideo_tpu.eval.judge_description analyze --in scores.json
"""

from __future__ import annotations

import argparse
import json
import re
import time
from typing import Dict, List, Optional

from .util import read_all_ranks

DIMENSIONS = ["Subject Correspondence", "Appearance Description",
              "Temporal Description", "Hallucination Detection"]

SYSTEM_PROMPT = """You are an expert evaluator of video object descriptions.
Given a ground-truth caption and a model-generated description of the same
object in a video, rate the generated description on four dimensions, each
an integer from 0 to 5:
1. Subject Correspondence: does the description refer to the same object?
2. Appearance Description: accuracy of color/shape/texture details.
3. Temporal Description: accuracy of actions and their order over time.
4. Hallucination Detection: 5 = no fabricated content, 0 = mostly fabricated.
Reply with exactly four lines, 'Dimension Name: score'."""


def judge_one(client, model_name: str, gt: str, pred: str, retries: int = 5):
    """Score one (gt, pred) pair with retry (reference 1.eval_gpt_new.py:20-48)."""
    user = f"Ground-truth caption: {gt}\nGenerated description: {pred}"
    for attempt in range(retries):
        try:
            resp = client.chat.completions.create(
                model=model_name,
                messages=[
                    {"role": "system", "content": SYSTEM_PROMPT},
                    {"role": "user", "content": user},
                ],
                temperature=0.0,
            )
            return resp.choices[0].message.content
        except Exception as e:  # pragma: no cover - network path
            if attempt == retries - 1:
                return f"JUDGE_ERROR: {e}"
            time.sleep(2 ** attempt)


def extract_scores(text: str) -> Optional[Dict[str, float]]:
    """Regex score extraction (reference 2.extract_re.py)."""
    out = {}
    for dim in DIMENSIONS:
        m = re.search(rf"{re.escape(dim)}\s*[:：]\s*([0-5](?:\.\d+)?)", text)
        if not m:
            return None
        out[dim] = float(m.group(1))
    return out


def cmd_judge(args):
    from openai import OpenAI  # gated: only needed for this subcommand

    client = OpenAI()
    records = read_all_ranks(args.pred_path)
    out: List[Dict] = []
    for r in records:
        verdict = judge_one(client, args.judge_model, r.get("caption", ""), r["pred"])
        out.append({**r, "judge": verdict})
    json.dump(out, open(args.out, "w"))


def cmd_extract(args):
    records = json.load(open(getattr(args, "in")))
    out = []
    for r in records:
        s = extract_scores(r.get("judge", ""))
        if s is not None:
            out.append({"id": r.get("id"), **s})
    json.dump(out, open(args.out, "w"))
    print(f"extracted {len(out)}/{len(records)}")


def cmd_analyze(args):
    records = json.load(open(getattr(args, "in")))
    if not records:
        print("no records")
        return
    for dim in DIMENSIONS:
        vals = [r[dim] for r in records if dim in r]
        print(f"{dim}: {sum(vals) / max(len(vals), 1):.2f}")
    all_means = [
        sum(r[d] for d in DIMENSIONS) / len(DIMENSIONS) for r in records
    ]
    print(f"Average: {sum(all_means) / len(all_means):.2f}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    j = sub.add_parser("judge")
    j.add_argument("--pred-path", required=True)
    j.add_argument("--out", required=True)
    j.add_argument("--judge-model", default="gpt-4o")
    e = sub.add_parser("extract")
    e.add_argument("--in", required=True)
    e.add_argument("--out", required=True)
    a = sub.add_parser("analyze")
    a.add_argument("--in", required=True)
    args = p.parse_args()
    {"judge": cmd_judge, "extract": cmd_extract, "analyze": cmd_analyze}[args.cmd](args)


if __name__ == "__main__":
    main()
