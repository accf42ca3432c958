"""MCQA scorer: overall + per-task accuracy.

Reference: eval/eval_video_mcqa_mvbench.py:39-67 and
eval/eval_videorefer_bench_q.py (same record format with type labels).
"""

from __future__ import annotations

import argparse
from collections import defaultdict

from .metrics import accuracy
from .util import read_all_ranks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-path", required=True)
    p.add_argument("--task-key", default="task_type")
    args = p.parse_args()

    records = read_all_ranks(args.pred_path)
    print(f"overall accuracy: {accuracy(records):.2f} ({len(records)} samples)")

    by_task = defaultdict(list)
    for r in records:
        by_task[r.get(args.task_key, "")].append(r)
    for task, recs in sorted(by_task.items()):
        if task:
            print(f"  {task}: {accuracy(recs):.1f} ({len(recs)})")


if __name__ == "__main__":
    main()
