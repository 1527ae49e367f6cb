"""Training loop: prefetching host pipeline, jitted step, TB logging,
checkpointing, SIGINT-save.

Behavioral reference: scripts/train_3dfront.py:142-311 — same observable
behavior (scalar names Loss_BBox/Loss_Translation/Loss_Size/Loss_Angle/
Loss_IoU/Loss_Shape/learning_rate, console prints every 50 steps, periodic
epoch checkpoints, SIGINT -> graceful save, args.json persisted for eval) with
a TPU-native engine: padded batches built by a background thread, one jitted
train step, Orbax checkpoints.
"""
from __future__ import annotations

import json
import os
import queue
import signal
import threading
import time
from typing import Iterator, Optional

import jax
import numpy as np

from ..data.collate import CollateSpec, collate_scenes
from ..data.sgfront import SGFrontDataset
from ..models.sgdiff import SGDiff, TrainState
from .checkpoint import save_checkpoint, restore_checkpoint


class InterruptHandler:
    """SIGINT -> finish the current step, save, exit
    (helpers/interrupt_handler.py:4-35)."""

    def __init__(self):
        self.interrupted = False
        self._orig = None

    def __enter__(self):
        self._orig = signal.getsignal(signal.SIGINT)
        def handler(sig, frame):
            self.interrupted = True
        signal.signal(signal.SIGINT, handler)
        return self

    def __exit__(self, *a):
        signal.signal(signal.SIGINT, self._orig)
        return False


def batch_iterator(dataset: SGFrontDataset, spec: CollateSpec,
                   batch_scenes: int, rng: np.random.Generator,
                   latent_lookup=None) -> Iterator:
    order = rng.permutation(len(dataset))
    buf = []
    for i in order:
        ex = dataset[int(i)]
        if ex is None:
            continue
        buf.append(ex)
        if len(buf) == batch_scenes:
            # thread the epoch rng so non-greedy shape sampling draws fresh
            # objects every batch (the reference's per-forward torch.randperm)
            b = collate_scenes(buf, spec, sdf_loader=dataset.load_sdf,
                               latent_lookup=latent_lookup, rng=rng)
            if b is not None:
                yield b
            buf = []
    if buf:
        b = collate_scenes(buf, spec, sdf_loader=dataset.load_sdf,
                           latent_lookup=latent_lookup, rng=rng)
        if b is not None:
            yield b


class Prefetcher:
    """Background-thread batch producer (the torch DataLoader worker analog)."""

    def __init__(self, make_iter, depth: int = 2):
        self.make_iter = make_iter
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.thread: Optional[threading.Thread] = None

    def _run(self):
        try:
            for b in self.make_iter():
                self.q.put(b)
        finally:
            self.q.put(None)

    def __iter__(self):
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        while True:
            b = self.q.get()
            if b is None:
                return
            yield b


class Trainer:
    def __init__(self, sgdiff: SGDiff, dataset: SGFrontDataset,
                 spec: CollateSpec, exp_dir: str, batch_scenes: int = 64,
                 log_every: int = 50, ckpt_every_epochs: int = 100,
                 seed: int = 0, writer=None, latent_lookup=None,
                 dp_devices: int = 1, zero1: bool = False):
        self.sgdiff = sgdiff
        self.dataset = dataset
        self.spec = spec
        self.exp_dir = exp_dir
        self.batch_scenes = batch_scenes
        self.log_every = log_every
        self.ckpt_every_epochs = ckpt_every_epochs
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.latent_lookup = latent_lookup
        self.dp_devices = dp_devices
        self.zero1 = zero1
        if zero1 and dp_devices <= 1:
            raise ValueError(
                "--zero1 requires dp_devices > 1 (optimizer-state sharding "
                "over the 'data' axis has nothing to shard on one device); "
                "drop --zero1 or raise --dp_devices")
        self._dp_step = None
        self._mesh = None
        self._dropped_batches = 0
        os.makedirs(os.path.join(exp_dir, "checkpoint"), exist_ok=True)
        self.writer = writer
        self.loss_log = open(os.path.join(exp_dir, "loss_log.txt"), "a")

    def _log_scalars(self, metrics, counter: int, lr: float):
        w = self.writer
        if w is None:
            return
        # reference scalar names (train_3dfront.py:266-281)
        w.add_scalar("learning_rate", lr, counter)
        w.add_scalar("Loss_BBox", float(metrics["layout_loss"]), counter)
        w.add_scalar("Loss_Translation", float(metrics["loss.trans"]), counter)
        w.add_scalar("Loss_Size", float(metrics["loss.size"]), counter)
        w.add_scalar("Loss_Angle", float(metrics["loss.angle"]), counter)
        w.add_scalar("Loss_IoU", float(metrics["loss.liou"]), counter)
        w.add_scalar("Loss_Shape", float(metrics["shape_loss"]), counter)

    def current_lr(self, counter: int) -> float:
        cfg = self.sgdiff.cfg
        # with grad accumulation the lr schedule advances once per OPTIMIZER
        # step (every grad_accum train_step calls), not per microbatch
        counter //= max(1, int(getattr(cfg, "grad_accum", 1) or 1))
        lr = cfg.lr_init
        for b, v in zip(cfg.lr_step, cfg.lr_evo):
            if counter >= b:
                lr = v
        return lr

    def preview_shapes(self, state: TrainState, batch, counter: int,
                       num_obj: int = 2):
        """Sample a few shapes and log rendered previews to TensorBoard
        (the reference's gen_shape_after_foward_2 + Visualizer image logging,
        train_3dfront.py:286-292)."""
        if self.writer is None or self.sgdiff.cfg.network_type != "echoscene":
            return
        try:
            out = self.sgdiff.sample_fn(state.params, state.batch_stats,
                                        batch, jax.random.PRNGKey(counter),
                                        gen_shape=True)
            from ..eval.render import render_sdf_grid
            sdfs = np.asarray(out["shapes"])[:num_obj, ..., 0]
            for i, g in enumerate(sdfs):
                img = render_sdf_grid(g)
                self.writer.add_image(f"gen_shape_{i}",
                                      img.transpose(2, 0, 1), counter)
        except Exception as e:  # preview must never kill training
            print(f"[trainer] preview failed: {e}")

    def train(self, state: TrainState, epochs: int,
              max_steps: Optional[int] = None,
              preview_every: int = 0,
              final_save: bool = True) -> TrainState:
        from .profiling import StepTimer
        state = self._maybe_zero1(state)
        counter = int(state.step)
        start_epoch = int(state.epoch)
        t_start = time.time()
        steps_done = 0
        timer = StepTimer(self.batch_scenes * max(1, self.dp_devices))

        if self.dp_devices > 1 and self._dp_step is None:
            mesh = self._get_mesh()
            if self.zero1:
                from ..parallel.zero import build_zero1_train_step
                self._dp_step = build_zero1_train_step(
                    self.sgdiff, mesh, donate=True)(state)
            else:
                from ..parallel.dp import build_dp_train_step
                self._dp_step = build_dp_train_step(
                    self.sgdiff, mesh, donate=True)(state)
        # shard_buf persists ACROSS epochs: with dp_devices > 1 a step needs
        # one batch per device, and an epoch's batch count need not divide
        # evenly — the remainder joins the next epoch's first group instead
        # of being silently dropped (up to dp_devices-1 batches per epoch).
        shard_buf = []
        with InterruptHandler() as h:
            for epoch in range(start_epoch, epochs):
                it = Prefetcher(lambda: batch_iterator(
                    self.dataset, self.spec, self.batch_scenes, self.rng,
                    self.latent_lookup))
                for batch in it:
                    if self.dp_devices > 1:
                        # accumulate one independent flat batch per device
                        shard_buf.append(jax.device_get(batch))
                        if len(shard_buf) < self.dp_devices:
                            continue
                        from ..parallel.mesh import stack_shards
                        stacked = stack_shards(shard_buf)
                        shard_buf = []
                        self.key, *sks = jax.random.split(
                            self.key, self.dp_devices + 1)
                        state, metrics = self._dp_step(
                            state, stacked, jax.numpy.stack(sks))
                    else:
                        self.key, sk = jax.random.split(self.key)
                        state, metrics = self.sgdiff.train_step(
                            state, batch, sk, donate=True)
                    timer.tick()
                    counter += 1
                    steps_done += 1
                    if counter % self.log_every == 0:
                        metrics = jax.device_get(metrics)
                        lr = self.current_lr(counter)
                        msg = ("loss at {}: box {:.4f}, shape {:.4f}. Lr:{:.6f}"
                               .format(counter, float(metrics["layout_loss"]),
                                       float(metrics["shape_loss"]), lr))
                        print(msg)
                        self.loss_log.write(msg + "\n")
                        self.loss_log.flush()
                        self._log_scalars(metrics, counter, lr)
                        if self.writer is not None:
                            self.writer.add_scalar("scenes_per_sec_per_chip",
                                                   timer.scenes_per_sec, counter)
                    if preview_every and counter % preview_every == 0:
                        self.preview_shapes(state, batch, counter)
                    if h.interrupted or (max_steps and steps_done >= max_steps):
                        break
                state = state.replace(epoch=state.epoch + 1)
                if h.interrupted or (max_steps and steps_done >= max_steps):
                    break
                if epoch % self.ckpt_every_epochs == 0:
                    # async: training resumes while Orbax writes; the final
                    # save below (and any restore) waits for it
                    self.save(state, epoch, wait=False)
            if shard_buf:
                # only the FINAL partial group (end of training) is dropped,
                # and loudly — never a silent per-epoch loss
                self._dropped_batches += len(shard_buf)
                print(f"[trainer] dropping {len(shard_buf)} trailing "
                      f"batch(es) smaller than one dp group "
                      f"(dp_devices={self.dp_devices}) at end of training")
            dt_steps = time.time() - t_start
            if final_save:
                t_save = time.time()
                self.save(state, int(state.epoch))
                print(f"[trainer] final save took {time.time() - t_save:.1f}s "
                      "(sync; periodic epoch saves are async)")
        if steps_done:
            # steps-only rate: the first step includes the jit compile, and
            # the final sync save is reported separately above — folding
            # either into one number misled a round-5 at-scale run
            print(f"[trainer] {steps_done} steps in {dt_steps:.1f}s "
                  f"({steps_done / dt_steps:.3f} steps/s incl. compile)")
        return state

    def _get_mesh(self):
        if self._mesh is None:
            from ..parallel.mesh import make_mesh
            self._mesh = make_mesh((self.dp_devices,), ("data",),
                                   jax.devices()[:self.dp_devices])
        return self._mesh

    def _maybe_zero1(self, state: TrainState) -> TrainState:
        """Swap the replicated optax state for a sharded Zero1State when the
        zero1 path is selected (idempotent; also applied before restore so a
        zero1 checkpoint restores against the matching template)."""
        if self.zero1 and self.dp_devices > 1:
            from ..parallel.zero import Zero1State, init_zero1_state
            if not isinstance(state.opt_state, Zero1State):
                accum = int(getattr(self.sgdiff.cfg, "grad_accum", 1) or 1)
                state = init_zero1_state(state, self._get_mesh(),
                                         grad_accum=accum)
        return state

    def save(self, state: TrainState, epoch: int, wait: bool = True):
        path = os.path.join(self.exp_dir, "checkpoint", f"model{epoch}")
        save_checkpoint(path, state, wait=wait)
        print(f"saved model_{epoch}" + ("" if wait else " (async)"))

    def load(self, state: TrainState, epoch: int) -> TrainState:
        path = os.path.join(self.exp_dir, "checkpoint", f"model{epoch}")
        return restore_checkpoint(path, self._maybe_zero1(state))


def dump_args(exp_dir: str, args: dict):
    """args.json contract (train_3dfront.py:205-206; eval reads it back)."""
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "args.json"), "w") as f:
        json.dump(args, f, indent=2)
