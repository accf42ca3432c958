"""Training loop: stepping, checkpointing, resume, metrics logging.

The TPU-native stand-in for the reference's HF Trainer + DeepSpeed stack
(reference: videorefer_trainer.py VideoReferTrainer, train.py:749-969):
grouped sampling, separate projector LR, periodic checkpoints with keep-N
rotation, adapter-only artifacts when only the projector/region encoder are
trainable, auto-resume, and per-step loss-dict logging.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from ..checkpoints import latest_checkpoint, load_params, save_params
from ..configs import UFVideoConfig
from ..parallel.mesh import create_mesh
from .data import Collator, SupervisedVideoDataset, modality_length_groups
from .train_step import TrainState, make_optimizer, make_train_step


@dataclass
class TrainConfig:
    output_dir: str = "checkpoints"
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = None
    warmup_ratio: float = 0.03
    total_steps: int = 10_000
    global_batch_size: int = 8
    save_steps: int = 100  # train_1121v1.sh:137
    save_total_limit: int = 4  # train_1121v1.sh:139
    log_steps: int = 1  # train_1121v1.sh:148
    grad_clip: float = 1.0
    group_by_modality_length: bool = True  # train_1121v1.sh grouped sampler
    tune_adapters_only: bool = False
    # reference freezing policy: vision tower + SAM2 stay frozen
    # (train.py:861-916, videorefer_arch.py:130-135)
    frozen_modules: tuple = ("vision", "sam")
    # reference train_mask_decoder default True (train.py:94): the SAM2
    # mask decoder trains even though the rest of SAM2 is frozen
    train_mask_decoder: bool = True
    seed: int = 0


class Trainer:
    def __init__(
        self,
        model,
        cfg: UFVideoConfig,
        train_cfg: TrainConfig,
        mesh=None,
        loss_fn=None,
        rules=None,
    ):
        """``rules``: partition rules override — pass
        ``parallel.partition.pipeline_rules()`` for pipeline-parallel runs
        (stacked LLM layer params shard over the mesh's pipe axis)."""
        self.model = model
        self.cfg = cfg
        self.tc = train_cfg
        self.mesh = mesh or create_mesh()
        self.rules = rules
        self.optimizer = make_optimizer(
            train_cfg.learning_rate,
            warmup_ratio=train_cfg.warmup_ratio,
            total_steps=train_cfg.total_steps,
            grad_clip=train_cfg.grad_clip,
            mm_projector_lr=train_cfg.mm_projector_lr,
        )
        self._loss_fn = loss_fn
        self._step_built = False
        self._log_path = os.path.join(train_cfg.output_dir, "train_log.jsonl")

    def _build_step(self, params) -> None:
        from .train_step import freeze_mask, with_frozen

        opt = self.optimizer
        mask = None
        if self.tc.frozen_modules and all(
            k in params for k in ("llm",)
        ):
            mask = freeze_mask(
                params,
                self.tc.frozen_modules,
                train_sam_mask_decoder=self.tc.train_mask_decoder,
            )
            opt = with_frozen(opt, mask)
        self._opt = opt
        kwargs = {} if self._loss_fn is None else {"loss_fn": self._loss_fn}
        if self.rules is not None:
            kwargs["rules"] = self.rules
        self.init_fn, self.step_fn, self.shard_state = make_train_step(
            self.model, opt, self.mesh, trainable_mask=mask, **kwargs
        )
        self._step_built = True

    # ---------------- state ----------------

    def init_state(self, params) -> TrainState:
        if not self._step_built:
            self._build_step(params)
        state = self.init_fn(jax.random.PRNGKey(self.tc.seed), params)
        with self.mesh:
            return self.shard_state(state)

    def maybe_resume(self, state: TrainState) -> TrainState:
        ckpt = latest_checkpoint(self.tc.output_dir)
        if ckpt is None:
            return state
        if self.tc.tune_adapters_only:
            # adapter-only checkpoints hold just {projector, region} (see
            # save()) — restore with the matching template and merge into
            # the fresh state; step/optimizer state are not stored in these
            # artifacts (frozen-base runs are cheap to warm-restart)
            template = {
                k: state.params[k]
                for k in ("projector", "region")
                if k in state.params
            }
            restored = load_params(ckpt, template)
            params = dict(state.params)
            params.update(restored)
            print(
                f"resumed adapter weights from {ckpt} "
                "(adapter-only artifact: step/optimizer state restart at 0)"
            )
            return state._replace(params=params)
        restored = load_params(ckpt, state)
        print(f"resumed from {ckpt} at step {int(restored.step)}")
        return restored

    # ---------------- checkpointing ----------------

    def save(self, state: TrainState) -> None:
        step = int(state.step)
        path = os.path.join(self.tc.output_dir, f"checkpoint-{step}")
        os.makedirs(self.tc.output_dir, exist_ok=True)
        if self.tc.tune_adapters_only:
            # adapter-only artifacts (videorefer_trainer.py:343-385): native
            # orbax plus the reference's mm_projector.bin/region_encoder.bin
            # flavor so the reference stack can consume them directly
            adapters = {
                k: state.params[k]
                for k in ("projector", "region")
                if k in state.params
            }
            save_params(path, adapters)  # collective: all processes write
            if jax.process_index() == 0:
                try:
                    from ..export import save_adapter_bins

                    save_adapter_bins(path, adapters, self.cfg)
                except ImportError:  # torch unavailable: orbax artifact only
                    pass
        else:
            save_params(path, state)
        # Multi-host NOTE: output_dir must be a SHARED filesystem (GCS /
        # NFS) — save_params writes collectively (every process contributes
        # its addressable shards to the same checkpoint directory, the
        # standard orbax/TPU-pod layout), so a host-local output_dir would
        # leave each host with an incomplete checkpoint that cannot be
        # restored. Rotation therefore runs on rank 0 only: on the shared
        # FS one rmtree removes every process's shards. See SCALING.md
        # "checkpointing".
        if jax.process_index() == 0:
            self._rotate()

    def export_hf(self, state: TrainState, path: str) -> None:
        """Write the final model as a reference-loadable HF-style checkpoint
        (export.save_hf_checkpoint) — the counterpart of the reference's
        safe_save_model_for_hf_trainer (videorefer_trainer.py:93-146)."""
        from ..export import save_hf_checkpoint

        params = jax.tree.map(np.asarray, state.params)
        save_hf_checkpoint(path, params, self.cfg)

    def _rotate(self) -> None:
        ckpts = sorted(
            (
                d for d in os.listdir(self.tc.output_dir)
                if d.startswith("checkpoint-") and d.split("-")[-1].isdigit()
            ),
            key=lambda d: int(d.split("-")[-1]),
        )
        while len(ckpts) > self.tc.save_total_limit:
            victim = os.path.join(self.tc.output_dir, ckpts.pop(0))
            shutil.rmtree(victim, ignore_errors=True)

    # ---------------- loop ----------------

    def train(
        self,
        state: TrainState,
        batches: Iterable,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        os.makedirs(self.tc.output_dir, exist_ok=True)
        rank0 = jax.process_index() == 0
        log = open(self._log_path, "a") if rank0 else None
        max_steps = max_steps or self.tc.total_steps
        t0 = time.time()
        with self.mesh:
            for batch in batches:
                if int(state.step) >= max_steps:
                    break
                state, metrics = self.step_fn(state, batch)
                step = int(state.step)
                if rank0 and step % self.tc.log_steps == 0:
                    rec = {
                        "step": step,
                        "time": round(time.time() - t0, 2),
                        **{k: float(v) for k, v in metrics.items()},
                    }
                    log.write(json.dumps(rec) + "\n")
                    log.flush()
                if step % self.tc.save_steps == 0:
                    self.save(state)
        if log is not None:
            log.close()
        return state


def shard_order_for_process(
    order: Sequence[int],
    global_batch_size: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[int]:
    """Per-process slice of a global sample order — the TPU counterpart of
    the reference's DistributedSampler under torchrun DDP.

    Every global batch of ``global_batch_size`` consecutive samples is split
    process-contiguously: process p takes rows [p·local, (p+1)·local). This
    matches how ``make_train_step`` assembles the global device array
    (process-major mesh ordering → earlier global rows live on process 0's
    devices), so the multi-process run consumes EXACTLY the batches the
    single-process run would."""
    pc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    if pc == 1:
        return list(order)
    if global_batch_size % pc != 0:
        raise ValueError(f"global batch {global_batch_size} % {pc} processes")
    local = global_batch_size // pc
    out: List[int] = []
    for i in range(0, len(order) - global_batch_size + 1, global_batch_size):
        out.extend(order[i + pid * local : i + (pid + 1) * local])
    return out


def build_sample_order(
    dataset: SupervisedVideoDataset, tc: TrainConfig
) -> List[int]:
    """Grouped sample order (reference grouped sampler,
    videorefer_trainer.py:210-241). Length = total conversation word count
    (the reference's modality_length proxy) — turn count is ~constant and
    would make the within-megabatch sort a no-op."""
    lengths = [
        sum(
            len(str(s.get("value", "")).split())
            for s in r.get("conversations", [])
            if isinstance(s, dict)
        )
        or 1
        for r in dataset.records
    ]
    modalities = [("video" in r or "image" in r) for r in dataset.records]
    if tc.group_by_modality_length:
        return modality_length_groups(
            lengths, modalities, tc.global_batch_size, seed=tc.seed
        )
    rng = np.random.RandomState(tc.seed)
    return list(rng.permutation(len(lengths)))
