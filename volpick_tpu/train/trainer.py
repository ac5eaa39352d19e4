"""Config-driven data-parallel trainer (the reference's `train.py` surface).

JSON config schema mirrors the reference (`volpick/model/train.py:67-78`):
{
  "model": "PhaseNet" | "EQTransformer",
  "model_args": {lr, sigma, prob_label_shape, sample_boundaries,
                 detection_fixed_window, loss_weights, ...model kwargs},
  "data": <dataset path>,
  "batch_size": 512, "num_workers": ignored,
  "trainer_args": {"max_epochs": 400},
  "stack_data": true, "ema": true, "swa": {"swa_lrs": ..., "swa_epoch_start": ...},
  "early_stop": true, "restrict_to_phase": "P"|"S"|null,
  "training_fraction": 1.0, "whole_dataset": false, "save_dir": "weights"
}

TPU-first execution: one jitted train step over a `Mesh(('data',))` with the
batch sharded on the data axis and parameters replicated — XLA inserts the
gradient all-reduce over ICI. EMA is fused into the step; the LR (base ×
500-step linear warm-up × ReduceLROnPlateau scale) enters as a scalar
argument so LR changes never recompile.
"""

from __future__ import annotations

import gc
import json
import math
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volpick_tpu import logger
from volpick_tpu.models import EQTransformer, PhaseNet, TPUPickNet, VolEQTransformer
from volpick_tpu.pipeline.augmentations import AugmentConfig
from volpick_tpu.pipeline.generator import TrainGenerator
from volpick_tpu.train.checkpoints import CheckpointManager, CSVMetricsLogger
from volpick_tpu.utils.tensorboard import TensorBoardLogger
from volpick_tpu.train.ema import ema_update, swa_update
from volpick_tpu.train.losses import vector_cross_entropy, vol_eqt_loss, weighted_bce
from volpick_tpu.train.schedules import EarlyStopper, PlateauScheduler, warmup_scale


def _set_path(tree, path: str, value: Dict):
    """Functionally merge `value` keys into the node at dotted `path`."""
    parts = path.split(".")

    def rec(node, i):
        if i == len(parts):
            new = dict(node)
            new.update(value)
            return new
        part = parts[i]
        if isinstance(node, list):
            idx = int(part)
            return [rec(v, i + 1) if j == idx else v for j, v in enumerate(node)]
        new = dict(node)
        new[part] = rec(node[part], i + 1)
        return new

    return rec(tree, 0)


def merge_bn_updates(params, updates: Dict[str, Dict]):
    for path, value in updates.items():
        params = _set_path(params, path, value)
    return params


def make_augment_config(model, model_args: Dict, stack: bool) -> AugmentConfig:
    sigma = float(model_args.get("sigma", 20))
    shape = model_args.get("prob_label_shape", "gaussian")
    if shape == "triangle":
        sigma *= 2  # reference `models.py:154-155`
    boundaries = model_args.get("sample_boundaries") or (None, None)
    common = dict(
        sigma=sigma,
        label_shape=shape,
        norm=model.norm,
        stack=stack,
        rotate_array=bool(model_args.get("rotate_array", False)),
        low=boundaries[0],
        high=boundaries[1],
    )
    if isinstance(model, EQTransformer):
        return AugmentConfig(
            window=model.in_samples,
            pre_window=2 * model.in_samples,
            samples_before=model.in_samples,
            noise_column=False,
            detection=True,
            detection_fixed_window=model_args.get("detection_fixed_window"),
            detrend=True,
            **common,
        )
    return AugmentConfig(
        window=model.in_samples,
        pre_window=6000,
        samples_before=3000,
        noise_column=True,
        detection=False,
        detrend=False,
        **common,
    )


class Trainer:
    """Data-parallel trainer for a (model, params) pair."""

    def __init__(
        self,
        model,
        params=None,
        lr: float = 1e-3,
        loss_weights=(0.05, 0.40, 0.55),
        ema: bool = False,
        ema_decay: float = 0.999,
        swa: Optional[dict] = None,
        warmup_steps: int = 500,
        lr_scheduler: Optional[str] = "ReduceLROnPlateau",
        lr_scheduler_args: Optional[dict] = None,
        monitor: str = "val_loss",
        seed: int = 42,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.params = params if params is not None else model.init(jax.random.PRNGKey(seed))
        self.lr = lr
        self.loss_weights = tuple(loss_weights)
        self.ema = ema
        self.ema_decay = ema_decay
        self.swa = swa or None
        self.warmup_steps = warmup_steps
        self.monitor = monitor
        self.seed = seed
        self.is_voleqt = isinstance(model, VolEQTransformer)
        self.is_eqt = isinstance(model, EQTransformer) and not self.is_voleqt

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("data",))
        self.mesh = mesh
        self.repl = NamedSharding(mesh, P())
        self.batch_sharding = NamedSharding(mesh, P("data"))

        args = dict(lr_scheduler_args or {})
        args.setdefault("factor", 0.5)
        args.setdefault("patience", 20)
        args.setdefault("min_lr", 1e-6)
        if lr_scheduler == "ReduceLROnPlateau":
            self.plateau = PlateauScheduler(base_lr=1.0, **{k: args[k] for k in ("factor", "patience", "min_lr")})
            self.plateau.lr = 1.0  # plateau controls a *scale*, not the lr itself
            self.plateau.min_lr = args["min_lr"] / lr  # scale-space floor
        else:
            self.plateau = None

        self.tx = optax.scale_by_adam()
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params) if ema else None
        self.swa_params = None
        self.swa_n = 0
        self.step = 0
        self.start_epoch = 0
        # best monitored value carried across restarts so a resumed run
        # cannot overwrite the pre-restart best checkpoint with a worse one
        self._restored_best = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- resume
    def restore(self, checkpoint_path):
        """Resume training state (params, EMA, SWA, optimizer moments, step)
        from a checkpoint written by this trainer — preemption recovery."""
        from flax import serialization

        from volpick_tpu.train.checkpoints import load_checkpoint

        raw = load_checkpoint(checkpoint_path)
        self.params = serialization.from_state_dict(self.params, raw["params"])
        if raw.get("opt_state") is not None:
            self.opt_state = serialization.from_state_dict(self.opt_state, raw["opt_state"])
        if raw.get("ema_params") is not None:
            template = self.ema_params if self.ema_params is not None else self.params
            self.ema_params = serialization.from_state_dict(template, raw["ema_params"])
        if raw.get("swa_params") is not None:
            self.swa_params = serialization.from_state_dict(self.params, raw["swa_params"])
        self.step = int(raw.get("step", 0))
        self.swa_n = int(raw.get("swa_n", 0) or 0)
        # Continue epoch numbering where the interrupted run stopped, like
        # Lightning's `fit(ckpt_path=...)` (reference resumes via
        # `trainer.fit(model, ckpt_path=...)`, volpick/model/train.py:214-222).
        if raw.get("epoch") is not None:
            self.start_epoch = int(raw["epoch"]) + 1
        if self.plateau is not None and raw.get("plateau") is not None:
            p = raw["plateau"]
            self.plateau.best = float(p.get("best", math.inf))
            self.plateau.num_bad_epochs = int(p.get("num_bad_epochs", 0))
            self.plateau.cooldown_counter = int(p.get("cooldown_counter", 0))
            self.plateau.lr = float(p.get("lr", self.plateau.base_lr))
        if raw.get("best_monitor") is not None and math.isfinite(float(raw["best_monitor"])):
            self._restored_best = float(raw["best_monitor"])
        return self

    # ------------------------------------------------------------------ steps
    def _loss(self, params, batch, train: bool, rng=None):
        if self.is_voleqt:
            if train:
                (rg, lp, p, s), bn_up = self.model.apply(params, batch["X"], train=True, rng=rng)
            else:
                rg, lp, p, s = self.model.apply(params, batch["X"])
                bn_up = {}
            # detection labels gate per trace by source type: LP traces
            # zero the regular head's target and vice versa
            # (EventTypeDetectionLabeller, reference `models.py:1376-1456`)
            det = batch["detections"][:, 0]
            is_lp = batch["is_lp"][:, None]
            weights = self.loss_weights
            if len(weights) == 3:  # EQT default given; reuse det weight twice
                weights = (weights[0], weights[0], weights[1], weights[2])
            loss = vol_eqt_loss(
                rg, lp, p, s,
                det * (1.0 - is_lp), det * is_lp,
                batch["y"][:, 0], batch["y"][:, 1],
                weights,
            )
        elif self.is_eqt:
            if train:
                (det, p, s), bn_up = self.model.apply(params, batch["X"], train=True, rng=rng)
            else:
                det, p, s = self.model.apply(params, batch["X"])
                bn_up = {}
            loss = weighted_bce(
                det, p, s, batch["detections"][:, 0], batch["y"][:, 0], batch["y"][:, 1], self.loss_weights
            )
        else:
            if train:
                pred, bn_up = self.model.apply(params, batch["X"], train=True)
            else:
                pred = self.model.apply(params, batch["X"])
                bn_up = {}
            loss = vector_cross_entropy(pred, batch["y"])
        return loss, bn_up

    def _build_steps(self):
        def train_step(params, opt_state, ema_params, batch, lr, rng):
            (loss, bn_up), grads = jax.value_and_grad(
                lambda p: self._loss(p, batch, train=True, rng=rng), has_aux=True
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
            params = merge_bn_updates(params, bn_up)
            if ema_params is not None:
                ema_params = ema_update(ema_params, params, self.ema_decay)
            return params, opt_state, ema_params, loss

        def eval_step(params, batch):
            loss, _ = self._loss(params, batch, train=False)
            return loss

        self._train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2),
            in_shardings=(self.repl, self.repl, self.repl, self.batch_sharding, None, None),
            out_shardings=(self.repl, self.repl, self.repl, self.repl),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(self.repl, self.batch_sharding), out_shardings=self.repl
        )

    # -------------------------------------------------------------------- fit
    def fit(
        self,
        train_gen: TrainGenerator,
        dev_gen: Optional[TrainGenerator] = None,
        max_epochs: int = 100,
        save_dir: Optional[str] = None,
        experiment: str = "exp",
        early_stop: bool = False,
        log_every: int = 5,
        check_val_every_n_epoch: int = 1,
        checkpoint_every_n_steps: Optional[int] = None,
        hparams: Optional[dict] = None,
        tensorboard: bool = True,
    ) -> Dict:
        if self._train_step is None:
            self._build_steps()
        monitor = self.monitor if dev_gen is not None else "train_loss"
        exp_dir = Path(save_dir or "weights") / experiment
        csvlog = CSVMetricsLogger(exp_dir, hparams=hparams or {})
        # CSV + TensorBoard side by side, like the reference
        # (`volpick/model/train.py:122-130`; TB skipped for test runs there)
        tblog = TensorBoardLogger(exp_dir / "tensorboard") if tensorboard else None
        ckpt = CheckpointManager(exp_dir / "checkpoints", monitor=monitor, save_ema=self.ema)
        if self._restored_best is not None:
            ckpt.best = self._restored_best
        stopper = EarlyStopper(patience=100) if early_stop else None
        # Fold the resumed epoch into the aug-PRNG stream so a resumed run
        # does not replay the pre-restart epochs' augmentation draws.
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed + 1), self.start_epoch)

        params, opt_state, ema_params = self.params, self.opt_state, self.ema_params
        plateau_scale = self.plateau.lr if self.plateau is not None else 1.0
        t_start = time.perf_counter()
        history = []
        # PL StochasticWeightAveraging semantics: swa_epoch_start may be an
        # int epoch index or a fraction of max_epochs; swa_lrs may be a list
        if self.swa:
            raw = self.swa.get("swa_epoch_start", 0.8)
            swa_start_epoch = int(raw) if raw >= 1 else int(float(raw) * max_epochs)
            swa_lr_cfg = self.swa.get("swa_lrs")
            if isinstance(swa_lr_cfg, (list, tuple)):
                swa_lr_cfg = swa_lr_cfg[0]
        else:
            swa_start_epoch = None
            swa_lr_cfg = None

        for epoch in range(self.start_epoch, max_epochs):
            # --- train
            losses = []
            for batch in train_gen.epoch():
                lr = self.lr * warmup_scale(self.step, self.warmup_steps) * plateau_scale
                if self.swa and swa_start_epoch is not None and epoch >= swa_start_epoch:
                    lr = float(swa_lr_cfg) if swa_lr_cfg is not None else lr
                rng, sub = jax.random.split(rng)
                batch = jax.device_put(batch, self.batch_sharding)
                params, opt_state, ema_params, loss = self._train_step(
                    params, opt_state, ema_params, batch, lr, sub
                )
                self.step += 1
                losses.append(loss)  # device scalar; synced once per epoch
                if checkpoint_every_n_steps and self.step % checkpoint_every_n_steps == 0:
                    state = self._state(params, opt_state, ema_params, epoch)
                    ckpt.update(state, {monitor: float(loss)}, epoch, self.step)
            train_loss = float(np.mean(jax.device_get(losses))) if losses else math.nan

            # --- SWA collection at epoch end
            if self.swa and epoch >= swa_start_epoch:
                if self.swa_params is None:
                    self.swa_params = jax.tree_util.tree_map(jnp.copy, params)
                    self.swa_n = 1
                else:
                    self.swa_params = swa_update(self.swa_params, params, self.swa_n)
                    self.swa_n += 1

            # --- validation (eval-mode forward; EMA weights when enabled,
            # mirroring the reference's swap_ema_weights around validation)
            # Lightning `check_val_every_n_epoch` semantics: validate every
            # Nth epoch (and always on the final one, so the run ends with a
            # fresh monitored value). Skipped epochs log val_loss=nan; the
            # checkpoint/plateau/early-stop paths already ignore nan, so best
            # selection and LR scheduling simply run at the val cadence.
            # Matched-step study legs at thousands of 1-step epochs would
            # otherwise spend most of their wall time in per-epoch validation.
            run_val = (epoch + 1) % max(int(check_val_every_n_epoch), 1) == 0 \
                or epoch == max_epochs - 1
            val_loss = math.nan
            if dev_gen is not None and run_val:
                eval_params = ema_params if ema_params is not None else params
                vlosses = [
                    float(self._eval_step(eval_params, jax.device_put(b, self.batch_sharding)))
                    for b in dev_gen.epoch()
                ]
                val_loss = float(np.mean(vlosses)) if vlosses else math.nan

            metrics = {
                "epoch": epoch,
                "step": self.step,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": self.lr * warmup_scale(self.step, self.warmup_steps) * plateau_scale,
                "time_s": time.perf_counter() - t_start,
            }
            csvlog.log(metrics)
            if tblog is not None:
                tblog.log_scalars(metrics, self.step)
                tblog.flush()
            history.append(metrics)
            logger.info(
                f"epoch {epoch}: train_loss={train_loss:.5f} val_loss={val_loss:.5f} lr={metrics['lr']:.2e}"
            )

            # Per-step device inputs are mostly invisible to Python's gc
            # accounting (jax/numpy buffers aren't tracked allocations), so
            # cyclic garbage holding them can accumulate for many epochs
            # before a gen-2 collection runs; collect explicitly at the epoch
            # boundary to bound host RSS on long runs.
            gc.collect()

            monitored = metrics[monitor]
            state = self._state(params, opt_state, ema_params, epoch)
            ckpt.update(state, metrics, epoch, self.step)
            if self.plateau is not None and not math.isnan(monitored):
                plateau_scale = self.plateau.step(monitored)
            if stopper is not None and not math.isnan(monitored) and stopper.step(monitored):
                logger.info(f"early stopping at epoch {epoch}")
                break

        self.params, self.opt_state, self.ema_params = params, opt_state, ema_params
        if tblog is not None:
            tblog.close()
        with open(exp_dir / "running_time.txt", "w") as f:
            f.write(str(time.perf_counter() - t_start))
        return {"history": history, "best_checkpoint": str(ckpt.best_path), "exp_dir": str(exp_dir)}

    def _state(self, params, opt_state, ema_params, epoch) -> Dict:
        # CheckpointManager.update stamps `best_monitor` (the post-update
        # best of the monitored loss) on top of this dict before writing.
        state = {
            "params": params,
            "ema_params": ema_params,
            "swa_params": self.swa_params,
            "swa_n": self.swa_n,
            "opt_state": opt_state,
            "step": self.step,
            "epoch": epoch,
        }
        if self.plateau is not None:
            state["plateau"] = {
                "best": self.plateau.best,
                "num_bad_epochs": self.plateau.num_bad_epochs,
                "cooldown_counter": self.plateau.cooldown_counter,
                "lr": self.plateau.lr,
            }
        return state


# --------------------------------------------------------------- config entry
_MODELS = {"phasenet": PhaseNet, "eqtransformer": EQTransformer, "tpupicknet": TPUPickNet,
           "voleqtransformer": VolEQTransformer}
_LIT_ONLY_ARGS = {
    "lr",
    "sigma",
    "prob_label_shape",
    "sample_boundaries",
    "rotate_array",
    "lr_scheduler",
    "lr_scheduler_args",
    "lr_monitor",
    "loss_weights",
    "detection_fixed_window",
}


def apply_training_fraction(training_fraction: float, train_ds) -> None:
    """Seeded *block* subsampling by `trace_name` bucket, matching the
    reference exactly (`volpick/model/train.py:335-359`): the unique bucket
    names (trace_name before '$') are shuffled with np.random.seed(42) and
    the first fraction of buckets is kept — so the same traces are selected
    for a given fraction regardless of runtime, and traces sharing an HDF5
    bucket are kept or dropped together (efficient blockwise reads)."""
    blocks = train_ds.metadata["trace_name"].astype(str).str.split("$").str[0]
    unique_blocks = blocks.unique()
    np.random.seed(42)
    np.random.shuffle(unique_blocks)
    # max(·, 1): a dataset with fewer buckets than 1/fraction would otherwise
    # go empty (the reference would too — int() floors to 0 — but an empty
    # training set only crashes later and less clearly)
    target = set(unique_blocks[: max(int(training_fraction * len(unique_blocks)), 1)])
    train_ds.filter(blocks.isin(target).to_numpy())


def prepare_data(config: Dict, model, test_run: bool = False, cfg: Optional[AugmentConfig] = None):
    """Dataset → (train_gen, dev_gen) following `train.py:225-332`."""
    from volpick_tpu.data import load_dataset

    dataset = load_dataset(config["data"])
    md = dataset.metadata

    restrict = config.get("restrict_to_phase")
    if restrict:
        # keep only traces carrying one of the requested phases (noise traces
        # are dropped — `train.py:362-372` generate_phase_mask semantics)
        keep = np.zeros(len(md), dtype=bool)
        from volpick_tpu.pipeline.generator import _onset_arrays

        p, s = _onset_arrays(md)
        if "P" in restrict:
            keep |= ~np.isnan(p)
        if "S" in restrict:
            keep |= ~np.isnan(s)
        dataset.filter(keep)
        md = dataset.metadata

    if config.get("remove_spikes") and "trace_has_spikes" in md.columns:
        dataset.filter(~md["trace_has_spikes"].fillna(False).astype(bool))
        md = dataset.metadata

    if not getattr(dataset, "had_split_column", True) or md["split"].isna().all():
        # auxiliary 60/10/30 split (`train.py:256-262`)
        logger.warning("dataset has no split column; injecting auxiliary 60/10/30 split")
        split = np.array(["train"] * len(md), dtype=object)
        split[int(0.6 * len(md)) : int(0.7 * len(md))] = "dev"
        split[int(0.7 * len(md)) :] = "test"
        dataset.metadata["split"] = split

    if config.get("whole_dataset"):
        dataset.metadata["split"] = "train"

    train_ds = dataset.get_split("train")
    dev_ds = dataset.get_split("dev")

    frac = float(config.get("training_fraction", 1.0))
    if not 0.0 < frac <= 1.0:
        raise ValueError("Training fraction needs to be between 0 and 1.")
    if frac < 1.0:
        apply_training_fraction(frac, train_ds)

    if test_run:
        for ds in (train_ds, dev_ds):
            if len(ds) > 1000:
                ds.filter(np.arange(len(ds)) < 1000)

    batch_size = 10 if test_run else int(config.get("batch_size", 256))
    stack = bool(config.get("stack_data", False))
    if cfg is None:
        cfg = make_augment_config(model, config.get("model_args", {}), stack)

    def subsets(ds):
        if not stack:
            return None, None
        from volpick_tpu.pipeline.generator import _onset_arrays

        p, s = _onset_arrays(ds.metadata)
        eq = ds.filter(~np.isnan(p) | ~np.isnan(s), inplace=False)
        noise = ds.filter(np.isnan(p) & np.isnan(s), inplace=False)
        return (eq if len(eq) else None), (noise if len(noise) else None)

    eq_tr, no_tr = subsets(train_ds)
    eq_dev, no_dev = subsets(dev_ds)
    # device-resident trace pools (None = auto: on when the pools fit HBM);
    # per-step host->device traffic becomes index vectors instead of waveforms
    device_data = config.get("device_data")
    train_gen = TrainGenerator(
        train_ds, cfg, batch_size, eq_dataset=eq_tr, noise_dataset=no_tr, seed=42,
        device_data=device_data,
    )
    dev_gen = (
        TrainGenerator(
            dev_ds, cfg, batch_size, eq_dataset=eq_dev, noise_dataset=no_dev, seed=43,
            drop_last=False, device_data=device_data,
        )
        if len(dev_ds)
        else None
    )
    return train_gen, dev_gen


def train(config: Dict, experiment_name: str = "exp", test_run: bool = False) -> Dict:
    """The `train.py --config` entry point (reference `train.py:63-222`)."""
    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    model_args = dict(config.get("model_args", {}))
    model_name = config["model"].lower()
    arch_args = {k: v for k, v in model_args.items() if k not in _LIT_ONLY_ARGS}
    model = _MODELS[model_name](**arch_args)

    params = None
    if config.get("pretrained"):
        from volpick_tpu.models import from_pretrained

        _, params = from_pretrained(model_name, config["pretrained"])
        logger.info(f"warm start from pretrained {config['pretrained']}")

    trainer = Trainer(
        model,
        params=params,
        lr=float(model_args.get("lr", 0.01)),
        loss_weights=tuple(model_args.get("loss_weights", (0.05, 0.40, 0.55))),
        ema=bool(config.get("ema", False)),
        swa=config.get("swa") or None,
        warmup_steps=int(config.get("warmup_steps", 500)),
        lr_scheduler=model_args.get("lr_scheduler", "ReduceLROnPlateau"),
        lr_scheduler_args=model_args.get("lr_scheduler_args"),
        monitor="train_loss" if config.get("whole_dataset") else "val_loss",
    )
    if config.get("resume"):
        ckpt = Path(config.get("save_dir", "weights")) / experiment_name / "checkpoints" / "last.ckpt"
        if ckpt.exists():
            trainer.restore(ckpt)
            logger.info(f"resumed from {ckpt} at step {trainer.step}")
    train_gen, dev_gen = prepare_data(config, model, test_run)
    if config.get("whole_dataset"):
        dev_gen = None
    return trainer.fit(
        train_gen,
        dev_gen,
        max_epochs=int(config.get("trainer_args", {}).get("max_epochs", 100)),
        check_val_every_n_epoch=int(
            config.get("trainer_args", {}).get("check_val_every_n_epoch", 1)
        ),
        save_dir=config.get("save_dir", "weights"),
        experiment=experiment_name,
        early_stop=bool(config.get("early_stop", False)),
        checkpoint_every_n_steps=5 if config.get("whole_dataset") else None,
        hparams=config,
        # reference skips the TensorBoard logger on test runs (`train.py:127-130`)
        tensorboard=not test_run,
    )


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Train a picking model from a JSON config")
    ap.add_argument("--config", required=True)
    ap.add_argument("--test_run", action="store_true")
    ap.add_argument("--whole_dataset", action="store_true")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--fraction", type=float, default=None)
    args = ap.parse_args(argv)
    with open(args.config) as f:
        config = json.load(f)
    if args.whole_dataset:
        config["whole_dataset"] = True
    if args.lr is not None:
        config.setdefault("model_args", {})["lr"] = args.lr
    if args.fraction is not None:
        config["training_fraction"] = args.fraction
    name = Path(args.config).stem
    if args.lr is not None:
        name += f"_lr{args.lr}"
    if args.fraction is not None:
        name += f"_frac{args.fraction}"
    return train(config, experiment_name=name, test_run=args.test_run)


if __name__ == "__main__":
    main()
