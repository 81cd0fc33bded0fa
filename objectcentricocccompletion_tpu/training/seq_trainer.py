"""Sequential (multi-frame) training for FSD++ (W7).

Rebuild of the reference's sequential pipeline
(``datasets/build_dataloader_sequential.py:15-130``,
``apis/seq_training_apis.py:30-244``): training samples are short windows of
consecutive frames from one log; the model carries its point memory across
the window and every frame contributes detection losses.

The reference keeps python-level recurrent state across dataloader
iterations (sequence-contiguous sharding + stateful model); here a window is
one jitted computation — the FSD++ memory threads through an unrolled
in-graph loop, so there is no host round-trip between frames.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.fsd import fsd_loss
from ..models.fsdpp import FSDPP, SequenceState


class SeqWindow(NamedTuple):
    points: jax.Array       # [W, N, C] consecutive frames
    points_mask: jax.Array  # [W, N]
    gt_boxes: jax.Array     # [W, M, 7]
    gt_labels: jax.Array    # [W, M]
    gt_valid: jax.Array     # [W, M]
    # optional offline seeds per frame (SeedStore, the reference's
    # tools/fsdpp flow); None -> the model consumes its own carried seeds
    seed_boxes: jax.Array | None = None    # [W, S, 7]
    seed_labels: jax.Array | None = None   # [W, S]
    seed_scores: jax.Array | None = None   # [W, S]
    seed_valid: jax.Array | None = None    # [W, S]


class SequenceLoader:
    """Draws windows of ``window`` consecutive frames from per-sequence
    frame lists. ``dataset.sequences() -> list[list[frame_index]]`` or the
    whole dataset is treated as one sequence.

    ``sequential=True`` walks each sequence front to back in non-
    overlapping windows (sequence order shuffled per epoch) and sets
    ``self.carry`` False at every sequence start — the trainer carries the
    FSD++ point memory across adjacent windows of the same log, matching
    the reference's sequence-contiguous sharding
    (``datasets/build_dataloader_sequential.py:77-130``)."""

    def __init__(self, dataset, window: int, seed: int = 0,
                 sequential: bool = False, seed_store=None):
        self.ds = dataset
        self.window = window
        self.rng = np.random.RandomState(seed)
        self.sequential = sequential
        # offline per-frame seeds (data/seed_store.SeedStore); requires the
        # dataset to expose frame_meta(index) -> (segment_name, timestamp)
        self.seed_store = seed_store
        if hasattr(dataset, "sequences"):
            self.seqs = dataset.sequences()
        else:
            self.seqs = [list(range(len(dataset)))]
        self.seqs = [s for s in self.seqs if len(s) >= window]
        assert self.seqs, "no sequence long enough for the window"
        self.carry = False
        self._order: list = []
        self._seq_i = 0
        self._beg = 0

    def __iter__(self):
        return self

    def _build(self, seq, beg) -> SeqWindow:
        samples = [self.ds.build_sample(seq[beg + i], self.rng)
                   for i in range(self.window)]

        def stack(k):
            return jnp.asarray(np.stack([s[k] for s in samples], 0))
        seeds = (None,) * 4
        if self.seed_store is not None:
            rows = [self.seed_store.get(*self.ds.frame_meta(seq[beg + i]))
                    for i in range(self.window)]
            seeds = tuple(jnp.asarray(np.stack([r[j] for r in rows], 0))
                          for j in range(4))
        return SeqWindow(stack("points"), stack("points_mask"),
                         stack("gt_boxes"), stack("gt_labels"),
                         stack("gt_valid"), *seeds)

    def __next__(self) -> SeqWindow:
        if not self.sequential:
            self.carry = False
            seq = self.seqs[self.rng.randint(len(self.seqs))]
            beg = self.rng.randint(0, len(seq) - self.window + 1)
            return self._build(seq, beg)
        if not self._order:
            self._order = list(self.rng.permutation(len(self.seqs)))
            self._seq_i = 0
            self._beg = 0
        seq = self.seqs[self._order[self._seq_i]]
        self.carry = self._beg > 0
        out = self._build(seq, self._beg)
        self._beg += self.window
        if self._beg + self.window > len(seq):
            self._beg = 0
            self._seq_i += 1
            if self._seq_i >= len(self._order):
                self._order = []
        return out


def make_seq_train_step(model: FSDPP, tx, window: int,
                        seed_aug: bool = True):
    """(params, opt_state, window_batch, mem_state, rng) ->
    (params, opt_state, new_mem, metrics). The memory AND seed boxes are
    carried in-graph across the window's frames and returned for the next
    window of the same sequence (or reset by the caller at sequence
    boundaries).

    ``seed_aug`` applies the reference's training seed augmentation
    (``preprocess_seed`` noise_cfg, ``two_stage_fsdpp.py:860-940``):
    random-FP insertion plus track-consistent seed dropout whose keep
    decisions chain across the window's frames."""

    loss_call = fsd_loss
    if getattr(model.cfg, "two_stage", False):
        from ..models.fsd_two_stage import two_stage_loss
        loss_call = two_stage_loss
    cfg = model.cfg
    use_seed_aug = (seed_aug and getattr(cfg, "use_seeds", False)
                    and (cfg.seed_fp_rate > 0 or cfg.seed_drop_rate > 0))

    def step_fn(params, opt_state, batch: SeqWindow, mem: SequenceState,
                rng: jax.Array):
        def loss_fn(p):
            losses = []
            m = mem
            chain = None    # (boxes, valid, keep) dropout carry
            for w in range(window):
                from ..ops import seeds as seed_ops
                seeds_in = None
                if batch.seed_boxes is not None:
                    # offline seed store (tools/fsdpp flow) overrides the
                    # carried self-detections
                    seeds_in = seed_ops.Seeds(
                        batch.seed_boxes[w], batch.seed_labels[w],
                        batch.seed_scores[w], batch.seed_valid[w])
                if use_seed_aug:
                    r_drop, r_fp = jax.random.split(
                        jax.random.fold_in(rng, w))
                    s = seeds_in if seeds_in is not None else m.seeds
                    keep = seed_ops.seed_dropout_step(
                        *(chain if chain is not None else (None,) * 3),
                        s.boxes, s.valid, r_drop, cfg.seed_drop_rate)
                    chain = (s.boxes, s.valid, keep)
                    s = seed_ops.Seeds(s.boxes, s.labels, s.scores, keep)
                    seeds_in = seed_ops.seed_fp_insertion(
                        s, r_fp, cfg.seed_fp_rate)
                # FSD++ runs on memory+frame; the loss's per-point targets
                # must align with that merged cloud (pre-update memory).
                merged_pts = jnp.concatenate([batch.points[w], m.memory], 0)
                m, out = model.apply({"params": p}, m, batch.points[w],
                                     batch.points_mask[w], seeds_in)
                losses.append(loss_call(out, merged_pts,
                                        batch.gt_boxes[w],
                                        batch.gt_labels[w],
                                        batch.gt_valid[w]))
            total = sum(l["loss"] for l in losses) / window
            aux = {k: sum(l[k] for l in losses) / window
                   for k in losses[0]}
            return total, (aux, m)

        (loss, (aux, new_mem)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # memory is observation state, not a differentiation target
        new_mem = jax.tree_util.tree_map(jax.lax.stop_gradient, new_mem)
        return params, opt_state, new_mem, dict(
            aux, grad_norm=optax.global_norm(grads))

    return jax.jit(step_fn, donate_argnums=(0, 1))


def train_fsdpp(model: FSDPP, dataset, work_dir: str, total_steps: int,
                window: int = 2, base_lr: float = 1e-5,
                ckpt_interval: int = 1000, log_interval: int = 50,
                seed: int = 0, resume: bool = True,
                sequential: bool = True):
    """Sequential FSD++ training loop (``apis/seq_training_apis.py``):
    one window per step. With ``sequential=True`` windows walk each log
    front to back and the point memory CARRIES across adjacent windows of
    the same sequence (reset at log boundaries); ``sequential=False``
    draws random windows with a fresh memory each step."""
    import time

    from .detector_trainer import DetectorState
    from .optim import make_optimizer
    from .trainer import CheckpointManager, MetricLogger

    loader = SequenceLoader(dataset, window=window, seed=seed,
                            sequential=sequential)
    win = next(loader)
    win_carry = loader.carry
    feat_dim = win.points.shape[-1]

    from ..models.fsdpp import init_sequence_state
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mem0 = init_sequence_state(model.cfg, feat_dim)
        params = model.init(jax.random.PRNGKey(seed), mem0, win.points[0],
                            win.points_mask[0])["params"]
        tx, _ = make_optimizer(base_lr, total_steps)
        opt_state = tx.init(params)
    params, opt_state = jax.device_put((params, opt_state))

    ckpt = CheckpointManager(f"{work_dir}/ckpt")
    logger = MetricLogger(work_dir, log_interval)
    start = 0
    if resume:
        restored = ckpt.restore(DetectorState(
            jnp.zeros((), jnp.int32), params, opt_state))
        if restored is not None:
            start = int(restored.step)
            params = jax.device_put(restored.params)
            opt_state = jax.device_put(restored.opt_state)

    step_fn = make_seq_train_step(model, tx, window)
    t_last = time.time()
    mem = jax.device_put(mem0)
    base_rng = jax.random.PRNGKey(seed + 1)
    for step in range(start, total_steps):
        if step > start:
            batch = next(loader)
            carry = loader.carry
        else:
            batch, carry = win, win_carry
        if not carry:   # sequence boundary: fresh point memory + seeds
            mem = jax.device_put(mem0)
        params, opt_state, mem, aux = step_fn(
            params, opt_state, batch, mem,
            jax.random.fold_in(base_rng, step))
        if (step + 1) % log_interval == 0:
            aux = jax.device_get(aux)
            dt = (time.time() - t_last) / log_interval
            t_last = time.time()
            logger.log(step + 1, {**aux, "windows_per_sec": 1.0 / dt})
        if (step + 1) % ckpt_interval == 0 or step + 1 == total_steps:
            ckpt.save(step + 1, jax.device_get(DetectorState(
                jnp.asarray(step + 1, jnp.int32), params, opt_state)), None)
    ckpt.wait()
    return params
